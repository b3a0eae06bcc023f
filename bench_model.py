"""Shared benchmark model configs (random-weight, real-architecture shapes)."""


def qwen3_0_6b_config():
    from transformers import Qwen3Config

    return Qwen3Config(
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, max_position_embeddings=40960, rope_theta=1000000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
        architectures=["Qwen3ForCausalLM"],
    )


def qwen2_0_5b_config():
    from transformers import Qwen2Config

    return Qwen2Config(
        vocab_size=151936, hidden_size=896, intermediate_size=4864,
        num_hidden_layers=24, num_attention_heads=14, num_key_value_heads=2,
        max_position_embeddings=32768, rope_theta=1000000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
        architectures=["Qwen2ForCausalLM"],
    )


def llama32_1b_config():
    from transformers import LlamaConfig

    return LlamaConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        head_dim=64, max_position_embeddings=131072, rope_theta=500000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=True,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        architectures=["LlamaForCausalLM"],
    )


def minicpm4_0_5b_config():
    """MiniCPM4-0.5B shapes (reference mini_cpm4.py:304-391): depth/width
    scaling knobs + LongRoPE frequency tables. The HF implementation is
    trust_remote_code (unavailable offline), so this is a duck-typed config
    — Config/_spec_from_hf read attributes only."""

    class MiniCPM4Config:
        architectures = ["MiniCPMForCausalLM"]
        model_type = "minicpm"
        vocab_size = 73448
        hidden_size = 1024
        intermediate_size = 4096
        num_hidden_layers = 24
        num_attention_heads = 16
        num_key_value_heads = 2
        head_dim = 64
        max_position_embeddings = 32768
        rope_theta = 10000.0
        rms_norm_eps = 1e-6
        tie_word_embeddings = True
        attention_bias = False
        scale_emb = 12.0
        scale_depth = 1.4
        dim_model_base = 256
        eos_token_id = 2
        rope_scaling = {
            "rope_type": "longrope",
            "short_factor": [1.0 + 0.02 * i for i in range(32)],
            "long_factor": [1.0 + 0.35 * i for i in range(32)],
            "original_max_position_embeddings": 32768,
        }

    return MiniCPM4Config()


def qwen3_vl_config():
    """Qwen3-VL with a 0.6B-class text tower (same decode shapes as
    qwen3-0.6b) and a mid-size ViT. Exercises the full multimodal path on
    hardware: vision tower forward, DeepStack injection into the first
    text layers, mrope, vision-slice streaming across chunked prefill
    (reference example/example_multimodal.py is its workload analogue)."""
    from transformers import Qwen3VLConfig
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLTextConfig, Qwen3VLVisionConfig)

    vc = Qwen3VLVisionConfig(
        depth=8, hidden_size=1024, intermediate_size=4096, num_heads=16,
        patch_size=16, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=1024, num_position_embeddings=1024,
        deepstack_visual_indexes=[0, 2, 4])
    tc = Qwen3VLTextConfig(
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, max_position_embeddings=40960, rope_theta=1000000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
        rope_scaling={"rope_type": "default", "mrope_section": [24, 20, 20],
                      "mrope_interleaved": True})
    cfg = Qwen3VLConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                        image_token_id=151655, video_token_id=151656,
                        vision_start_token_id=151652,
                        vision_end_token_id=151653)
    cfg.architectures = ["Qwen3VLForConditionalGeneration"]
    return cfg


def qwen3_30b_a3b_config():
    """Qwen3-30B-A3B (MoE, ~30.5B total / 3.3B active): 48 layers, 128
    experts top-8, hidden 2048. int4-packed this is ~15 GB — the largest
    model a single 16 GB chip can serve (bench runs quantized_init)."""
    from transformers import Qwen3MoeConfig

    return Qwen3MoeConfig(
        vocab_size=151936, hidden_size=2048, intermediate_size=6144,
        moe_intermediate_size=768, num_experts=128, num_experts_per_tok=8,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        num_hidden_layers=48, num_attention_heads=32, num_key_value_heads=4,
        head_dim=128, max_position_embeddings=40960, rope_theta=1000000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        architectures=["Qwen3MoeForCausalLM"],
    )
