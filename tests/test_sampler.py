"""Sampler semantics: greedy, temperature, top-k, top-p."""

import numpy as np

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.sampler import sample_tokens, sample_tokens_filtered


def test_greedy_is_argmax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((5, 50)).astype(np.float32))
    toks = sample_tokens(logits, jnp.zeros(5), jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(logits.argmax(-1)))


def test_temperature_sampling_distribution():
    logits = jnp.asarray(np.log(np.asarray([[0.7, 0.2, 0.1] + [1e-9] * 5],
                                           np.float32)))
    counts = np.zeros(8)
    for i in range(400):
        t = sample_tokens(logits, jnp.ones(1), jax.random.key(i))
        counts[int(t[0])] += 1
    freq = counts / counts.sum()
    assert abs(freq[0] - 0.7) < 0.1
    assert abs(freq[1] - 0.2) < 0.1


def test_top_k_restricts_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    top3 = set(np.asarray(jnp.argsort(-logits, axis=-1))[0, :3].tolist())
    for i in range(50):
        toks = sample_tokens_filtered(
            logits, jnp.ones(2), jnp.asarray([3, 0], jnp.int32),
            jnp.ones(2), jax.random.key(i))
        assert int(toks[0]) in top3  # row 0: top-k=3
        # row 1: unfiltered, any token allowed


def test_top_p_restricts_support():
    # distribution: 0.6, 0.3, 0.1 -> top_p=0.8 keeps tokens {0, 1}
    logits = jnp.asarray(np.log(np.asarray(
        [[0.6, 0.3, 0.1] + [1e-12] * 7], np.float32)))
    for i in range(60):
        toks = sample_tokens_filtered(
            logits, jnp.ones(1), jnp.zeros(1, jnp.int32),
            jnp.asarray([0.8], jnp.float32), jax.random.key(i))
        assert int(toks[0]) in (0, 1)


def test_top_p_always_keeps_argmax():
    logits = jnp.asarray(np.log(np.asarray([[0.9, 0.1]], np.float32)))
    toks = sample_tokens_filtered(
        logits, jnp.ones(1), jnp.zeros(1, jnp.int32),
        jnp.asarray([0.01], jnp.float32), jax.random.key(0))
    assert int(toks[0]) == 0


def test_engine_topk_sampling_runs():
    from transformers import Qwen3Config

    from nanovllm_tpu import LLM, SamplingParams

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        architectures=["Qwen3ForCausalLM"])
    llm = LLM(cfg, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
              num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
              prefill_chunk=16, dtype="float32", attention_backend="jnp",
              warmup=False)
    rng = np.random.default_rng(2)
    out = llm.generate([list(rng.integers(1, 127, size=10))],
                       SamplingParams(temperature=0.8, top_k=5, top_p=0.9,
                                      max_tokens=6, ignore_eos=True),
                       use_tqdm=False)
    assert len(out[0]["token_ids"]) == 6
