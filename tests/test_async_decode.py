"""Async-decode chain (one-step-ahead dispatch, llm_engine._try_chain).

The chain feeds step N's device samples into step N+1 via an in-jit gather
and commits step N one call late — outputs must match the synchronous path
exactly under greedy decoding, across EOS mid-batch (zombie lanes), block
boundary crossings (reserve_for_chain + commit-time sealing), page pressure
(chain declines, scheduler preempts), and staggered arrivals.
"""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams


def make_llm(async_decode, **kw):
    from transformers import Qwen3Config

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )
    base = dict(max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
                num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
                prefill_chunk=16, dtype="float32", attention_backend="jnp",
                warmup=False)
    base.update(kw)
    return LLM(cfg, async_decode=async_decode, **base)


def prompts(rng, n, lo=5, hi=40):
    return [list(rng.integers(1, 127, size=int(rng.integers(lo, hi))))
            for _ in range(n)]


def both(ps, sp, **kw):
    a = make_llm(False, **kw).generate(ps, sp, use_tqdm=False)
    b = make_llm(True, **kw).generate(ps, sp, use_tqdm=False)
    return a, b


def test_chain_matches_sync_greedy():
    rng = np.random.default_rng(0)
    ps = prompts(rng, 4)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    sync, chained = both(ps, sp)
    for s, c in zip(sync, chained):
        assert s["token_ids"] == c["token_ids"]
        assert len(c["token_ids"]) == 12


def test_chain_crosses_block_boundaries():
    # block_size=16 with 31/32/33-token prompts: decode crosses a block
    # boundary within the chain (reserve_for_chain takes fresh pages and the
    # commit-time seal publishes filled blocks).
    rng = np.random.default_rng(1)
    ps = [list(rng.integers(1, 127, size=n)) for n in (31, 32, 33)]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    sync, chained = both(ps, sp)
    for s, c in zip(sync, chained):
        assert s["token_ids"] == c["token_ids"]


def test_chain_with_eos_zombies():
    # eos=5 not ignored: lanes die mid-chain at unpredictable steps; the
    # already-dispatched chain step carries them as zombies whose sampled
    # tokens must be discarded.
    rng = np.random.default_rng(2)
    ps = prompts(rng, 4)
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=False)
    eng_s = make_llm(False)
    eng_c = make_llm(True)
    eng_s.config.eos = eng_c.config.eos = 5
    sync = eng_s.generate(ps, sp, use_tqdm=False)
    chained = eng_c.generate(ps, sp, use_tqdm=False)
    for s, c in zip(sync, chained):
        assert s["token_ids"] == c["token_ids"]


def test_chain_mixed_max_tokens():
    # Different max_tokens per lane: predictable finishers leave the chain
    # exactly one step before their commit.
    rng = np.random.default_rng(3)
    ps = prompts(rng, 4)
    sps = [SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
           for m in (1, 3, 9, 17)]
    sync = make_llm(False).generate(ps, sps, use_tqdm=False)
    chained = make_llm(True).generate(ps, sps, use_tqdm=False)
    for s, c, m in zip(sync, chained, (1, 3, 9, 17)):
        assert s["token_ids"] == c["token_ids"]
        assert len(c["token_ids"]) == m


def test_chain_under_page_pressure():
    # A pool too small for all lanes to grow freely: the chain must decline
    # when reservations would exhaust pages, falling back to the preempting
    # scheduler; every request still completes.
    rng = np.random.default_rng(4)
    ps = prompts(rng, 6, lo=20, hi=40)
    sp = SamplingParams(temperature=0.0, max_tokens=25, ignore_eos=True)
    sync, chained = both(ps, sp, num_kvcache_blocks=24)
    for s, c in zip(sync, chained):
        assert s["token_ids"] == c["token_ids"]
        assert len(c["token_ids"]) == 25


def test_chain_actually_chains():
    # White-box: in decode steady state the engine must hold an in-flight
    # chained plan between step() calls.
    rng = np.random.default_rng(5)
    eng = make_llm(True)
    for p in prompts(rng, 3):
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=10,
                                          ignore_eos=True))
    saw_chain = 0
    while not eng.is_finished():
        eng.step()
        if eng._inflight is not None:
            assert eng._inflight[0].chained
            saw_chain += 1
    assert saw_chain >= 7  # ~max_tokens-ish steps ran through the chain


def test_chain_prefix_cache_publishes():
    # Blocks filled during a chain must still publish (seal_filled at
    # commit): a repeated prompt+completion prefix should hit the cache.
    rng = np.random.default_rng(6)
    base = list(rng.integers(1, 127, size=30))
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    eng = make_llm(True)
    first = eng.generate([base], sp, use_tqdm=False)
    # Re-ask with the first answer appended: prompt covers blocks the CHAIN
    # filled (30 prompt + 10 generated = 40 > 2 full 16-blocks).
    longer = base + first[0]["token_ids"]
    second = eng.generate([longer], sp, use_tqdm=False)
    assert second[0]["cache_tokens"] >= 32


def test_window_chaining_matches_sync():
    """Generalized chaining (schedule_plan_ahead): long prompts forced
    through multiple chunked-prefill windows while other lanes decode —
    every step should chain (windows + admissions are value-independent;
    virtual decode lanes gather on device) and outputs must equal the
    synchronous path exactly."""
    rng = np.random.default_rng(7)
    # long prompts -> several 32-token windows each; staggered lengths so
    # mixed steps carry windows AND virtual decode lanes simultaneously.
    ps = [list(rng.integers(1, 127, size=n)) for n in (90, 70, 12, 45)]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    kw = dict(chunked_prefill=True, prefill_step_tokens=32)
    sync, chained = both(ps, sp, **kw)
    for s, c in zip(sync, chained):
        assert s["token_ids"] == c["token_ids"]
        assert len(c["token_ids"]) == 16


def test_window_chaining_sampled_matches():
    """Same but with temperature sampling: the counter-derived PRNG key
    makes sampled runs reproducible only if the chained schedule issues the
    SAME step sequence as... it does not (chaining changes step boundaries),
    so instead assert the run completes with the right shape and respects
    max_tokens under continuous admission pressure (more prompts than
    lanes)."""
    rng = np.random.default_rng(8)
    ps = prompts(rng, 10, lo=20, hi=60)  # 10 prompts over 4 lanes
    sp = SamplingParams(temperature=0.8, max_tokens=10, ignore_eos=True)
    out = make_llm(True, chunked_prefill=True,
                   prefill_step_tokens=32).generate(ps, sp, use_tqdm=False)
    assert len(out) == 10
    assert all(len(o["token_ids"]) == 10 for o in out)


def test_window_chaining_with_eos():
    """EOS zombies inside chained mixed steps: lanes finishing by EOS at a
    commit must not corrupt later chained windows/decodes."""
    rng = np.random.default_rng(9)
    ps = [list(rng.integers(1, 127, size=n)) for n in (50, 33, 8)]
    sp = SamplingParams(temperature=0.0, max_tokens=24)  # honor EOS
    kw = dict(chunked_prefill=True, prefill_step_tokens=32)
    sync, chained = both(ps, sp, **kw)
    for s, c in zip(sync, chained):
        assert s["token_ids"] == c["token_ids"]
