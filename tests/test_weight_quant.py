"""Weight-only INT8: numerical tolerance and engine integration."""

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu.ops.quant import quant_matmul, quantize_dense_params, quantize_weight


def test_quantized_matmul_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32), dtype=np.float32)) * 0.05
    q, s = quantize_weight(w)
    ref = np.asarray(x @ w)
    got = np.asarray(quant_matmul(x, q, s))
    # int8 per-channel: relative error well under 1%
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.01, rel


def test_engine_e2e_int8_weights_close_to_fp32():
    from transformers import Qwen3Config

    from nanovllm_tpu import LLM, SamplingParams

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )
    kwargs = dict(max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
                  num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
                  prefill_chunk=16, attention_backend="jnp", warmup=False,
                  dtype="float32")
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, 127, size=24))]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    out_fp = LLM(cfg, **kwargs).generate(prompts, sp, use_tqdm=False)
    out_q8 = LLM(cfg, quantization="int8", **kwargs).generate(
        prompts, sp, use_tqdm=False)
    assert len(out_q8[0]["token_ids"]) == 8
    # first greedy tokens should survive quantization on a tiny model
    assert out_fp[0]["token_ids"][0] == out_q8[0]["token_ids"][0]


def test_quantize_params_structure():
    import jax

    from nanovllm_tpu.models import dense

    spec = dense.DenseSpec(
        vocab_size=64, hidden_size=32, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64,
        max_position_embeddings=64, tie_word_embeddings=True, qk_norm=True)
    params = dense.init_params(spec, jax.random.key(0), dtype=jnp.float32)
    qp = quantize_dense_params(params)
    assert qp["layers"]["wqkv"].dtype == jnp.int8
    assert qp["layers"]["wqkv_scale"].shape == (2, spec.qkv_size)
    assert qp["lm_head"].dtype == jnp.int8
    assert qp["embed"].dtype == jnp.float32  # embeddings stay high precision


def test_pallas_int8_matmul_matches_xla_path():
    # Interpreter-mode check of the fused dequant kernel against the plain
    # XLA dequant-then-dot (identical math, different data movement).
    from nanovllm_tpu.ops.pallas.quant_matmul import int8_matmul

    rng = np.random.default_rng(3)
    T, K, N = 16, 256, 128
    x = jnp.asarray(rng.standard_normal((T, K), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((K, N), dtype=np.float32)) * 0.05
    q, s = quantize_weight(w)
    ref = np.asarray(quant_matmul(x, q, s))
    got = np.asarray(int8_matmul(x, q, s, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
