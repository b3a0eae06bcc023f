"""Numerical parity vs HuggingFace transformers on CPU.

Runs tiny random-weight models through BOTH stacks: HF torch gives reference
logits for the full sequence; our engine path runs a real prefill (paged KV
write + ragged attention + suffix-only compute) followed by paged decode
steps. This exercises weight fusion/stacking, rope, qk-norm, the cache
layout, and batch prep in one go.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.engine.batch import prepare_batch
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models import dense
from nanovllm_tpu.ops.attention import AttnMeta, KVCache
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.loader import load_dense_params

BLOCK = 16
NBLOCKS = 64
MAXB = 8  # pages per seq -> max_model_len 128
S = 4
BUCKETS = (64, 128)


def run_engine_logits(spec, params, prompts, n_decode=3, hf_next_tokens=None):
    """Prefill all prompts, then n_decode paged decode steps (appending
    hf_next_tokens). Returns list of (S_real, V) logits per step."""
    bm = BlockManager(NBLOCKS - 1, BLOCK)
    seqs = [Sequence(list(p), SamplingParams(), block_size=BLOCK) for p in prompts]
    for s in seqs:
        bm.allocate(s)

    cache = KVCache.zeros(spec.num_layers, NBLOCKS, BLOCK,
                          spec.num_kv_heads, spec.head_dim, jnp.float32)

    def step(batch, cache):
        meta = AttnMeta(
            seg_ids=jnp.asarray(batch.seg_ids),
            positions=jnp.asarray(batch.positions),
            slot_mapping=jnp.asarray(batch.slot_mapping),
            block_tables=jnp.asarray(batch.block_tables),
            context_lens=jnp.asarray(batch.context_lens),
            last_token_idx=jnp.asarray(batch.last_token_idx),
            chunk_seg=jnp.asarray(batch.chunk_seg),
            num_seqs=jnp.asarray(batch.num_seqs),
        )
        hidden, cache = dense.forward(
            spec, params, jnp.asarray(batch.input_ids), meta, cache)
        logits = dense.compute_logits(spec, params, hidden)
        return np.asarray(logits), cache

    out = []
    batch = prepare_batch(seqs, True, block_size=BLOCK, dummy_slot=(NBLOCKS - 1) * BLOCK,
                          max_num_seqs=S, blocks_per_seq=MAXB, token_buckets=BUCKETS, chunk=16)
    logits, cache = step(batch, cache)
    out.append(logits[: len(seqs)])

    for d in range(n_decode):
        for i, s in enumerate(seqs):
            s.append_token(int(hf_next_tokens[d][i]))
            bm.append_slot(s)
        batch = prepare_batch(seqs, False, block_size=BLOCK, dummy_slot=(NBLOCKS - 1) * BLOCK,
                              max_num_seqs=S, blocks_per_seq=MAXB, token_buckets=BUCKETS, chunk=16)
        logits, cache = step(batch, cache)
        out.append(logits[: len(seqs)])
    return out


def hf_reference_logits(model, prompts, n_decode, rng):
    """HF full-forward logits at each engine step + the tokens to append."""
    import torch

    steps, next_tokens = [], []
    seqs = [list(p) for p in prompts]
    for d in range(n_decode + 1):
        step_logits = []
        for s in seqs:
            with torch.no_grad():
                lg = model(torch.tensor([s])).logits[0, -1].float().numpy()
            step_logits.append(lg)
        steps.append(np.stack(step_logits))
        toks = [int(rng.integers(0, model.config.vocab_size)) for _ in seqs]
        next_tokens.append(toks)
        for s, t in zip(seqs, toks):
            s.append(t)
    return steps, next_tokens


def make_tiny_qwen3():
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, architectures=["Qwen3ForCausalLM"],
    )
    return cfg, Qwen3ForCausalLM(cfg).eval()


def make_tiny_llama():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True, attention_bias=False,
        architectures=["LlamaForCausalLM"],
    )
    return cfg, LlamaForCausalLM(cfg).eval()


def make_tiny_qwen2():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(2)
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, architectures=["Qwen2ForCausalLM"],
    )
    return cfg, Qwen2ForCausalLM(cfg).eval()


@pytest.mark.parametrize("maker", [make_tiny_qwen3, make_tiny_llama, make_tiny_qwen2],
                         ids=["qwen3", "llama", "qwen2"])
def test_prefill_and_decode_parity(maker):
    cfg, model = maker()
    spec = dense.spec_from_hf(cfg, max_model_len=128)
    params = load_dense_params(spec, model.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(42)
    prompts = [list(rng.integers(1, 127, size=n)) for n in (7, 19, 33)]
    n_decode = 3
    hf_steps, next_tokens = hf_reference_logits(model, prompts, n_decode, rng)
    engine_steps = run_engine_logits(spec, params, prompts, n_decode, next_tokens)

    for step_idx, (ours, ref) in enumerate(zip(engine_steps, hf_steps)):
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {step_idx}")
        # argmax agreement is the bar that matters for greedy decoding
        assert (ours.argmax(-1) == ref.argmax(-1)).all(), f"step {step_idx}"


def test_prefix_cache_reuse_matches_fresh_compute():
    """Second prompt sharing a 16-token block must produce identical logits
    whether the prefix came from the cache or was computed fresh."""
    cfg, model = make_tiny_qwen3()
    spec = dense.spec_from_hf(cfg, max_model_len=128)
    params = load_dense_params(spec, model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    shared = list(rng.integers(1, 127, size=BLOCK))
    p1 = shared + list(rng.integers(1, 127, size=5))
    p2 = shared + list(rng.integers(1, 127, size=9))

    hf_steps, _ = hf_reference_logits(model, [p2], 0, rng)

    bm = BlockManager(NBLOCKS - 1, BLOCK)
    cache = KVCache.zeros(spec.num_layers, NBLOCKS, BLOCK,
                          spec.num_kv_heads, spec.head_dim, jnp.float32)

    def run_prefill(seq, cache):
        batch = prepare_batch([seq], True, block_size=BLOCK,
                              dummy_slot=(NBLOCKS - 1) * BLOCK, max_num_seqs=S,
                              blocks_per_seq=MAXB, token_buckets=BUCKETS, chunk=16)
        meta = AttnMeta(*[jnp.asarray(x) for x in
                          (batch.seg_ids, batch.positions, batch.slot_mapping,
                           batch.block_tables, batch.context_lens,
                           batch.last_token_idx, batch.chunk_seg,
                           batch.num_seqs)])
        hidden, cache = dense.forward(
            spec, params, jnp.asarray(batch.input_ids), meta, cache)
        return np.asarray(dense.compute_logits(spec, params, hidden)), cache

    s1 = Sequence(p1, SamplingParams(), block_size=BLOCK)
    bm.allocate(s1)
    _, cache = run_prefill(s1, cache)

    s2 = Sequence(p2, SamplingParams(), block_size=BLOCK)
    bm.allocate(s2)
    assert s2.num_cached_tokens == BLOCK  # the shared block was a hit
    logits2, cache = run_prefill(s2, cache)

    np.testing.assert_allclose(logits2[0], hf_steps[0][0], rtol=2e-4, atol=2e-4)
