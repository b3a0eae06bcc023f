"""The bench.py qwen3-vl workload path on CPU: make_vl_requests builds
pre-expanded multimodal requests (vision span + random pixels) with the
right shapes, and the same request structure runs end-to-end through
generate_multimodal on a tiny VL model."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from nanovllm_tpu import LLM, SamplingParams


def tiny_vl_cfg():
    from transformers import Qwen3VLConfig
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLTextConfig, Qwen3VLVisionConfig)

    vc = Qwen3VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=48, num_position_embeddings=64,
        deepstack_visual_indexes=[0, 1])
    tc = Qwen3VLTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512,
        rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                      "mrope_interleaved": True})
    cfg = Qwen3VLConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                        image_token_id=155, video_token_id=156,
                        vision_start_token_id=157, vision_end_token_id=158)
    cfg.architectures = ["Qwen3VLForConditionalGeneration"]
    return cfg


def test_make_vl_requests_structure():
    import bench

    cfg = tiny_vl_cfg()  # same attribute surface as the bench family config
    rng = np.random.default_rng(0)
    reqs = bench.make_vl_requests(cfg, num_seqs=3, max_input_len=200,
                                  rng=rng)
    t, h, w = bench.VL_GRID
    merge = cfg.vision_config.spatial_merge_size
    n_vis = t * h * w // (merge * merge)
    pin = (3 * cfg.vision_config.temporal_patch_size
           * cfg.vision_config.patch_size ** 2)
    for r in reqs:
        ids = r["input_ids"]
        assert ids.count(cfg.image_token_id) == n_vis
        assert ids.count(cfg.vision_start_token_id) == 1
        assert ids.count(cfg.vision_end_token_id) == 1
        # the vision span is contiguous: start token directly before it
        s = ids.index(cfg.image_token_id)
        assert ids[s - 1] == cfg.vision_start_token_id
        assert ids[s + n_vis] == cfg.vision_end_token_id
        assert r["pixel_values"].shape == (t * h * w, pin)
        assert r["image_grid_thw"] == [bench.VL_GRID]


def test_vl_request_structure_runs_end_to_end():
    rng = np.random.default_rng(1)
    reqs = []
    for _ in range(3):
        pre = [int(x) for x in rng.integers(1, 150, size=5)]
        post = [int(x) for x in rng.integers(1, 150, size=7)]
        ids = pre + [157] + [155] * 4 + [158] + post
        pixels = rng.standard_normal((16, 96)).astype(np.float32)
        reqs.append({"input_ids": ids, "pixel_values": pixels,
                     "image_grid_thw": [(1, 4, 4)]})
    llm = LLM(tiny_vl_cfg(), max_num_seqs=4, max_model_len=128,
              kvcache_block_size=16, num_kvcache_blocks=64,
              prefill_token_buckets=(64, 128), prefill_chunk=16,
              dtype="float32", attention_backend="jnp", warmup=False)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate_multimodal(reqs, sp, use_tqdm=False)
    assert len(outs) == 3
    assert all(len(o["token_ids"]) == 8 for o in outs)
