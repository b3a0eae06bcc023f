"""Data-parallel replica pool (parallel/replicas.py): dp=2 x tp=4 on the
8-virtual-device CPU mesh. Proves (VERDICT r4 #6):
- two replicas serve DISJOINT request streams concurrently,
- each replica's results are bit-identical to a standalone tp=4 engine
  fed the same sub-stream (same seed, greedy) — replicas share no state,
- each replica owns its own sharded KV cache on its own device group.
"""

import jax
import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.parallel.replicas import DataParallelPool

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def tiny_cfg():
    from transformers import Qwen3Config

    return Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )


BASE = dict(max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
            num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
            prefill_chunk=16, dtype="float32", attention_backend="jnp",
            warmup=False)


def test_dp2_tp4_matches_standalone_engines():
    cfg = tiny_cfg()
    pool = DataParallelPool(cfg, dp=2, tensor_parallel_size=4,
                            same_seed=True, seed=11, **BASE)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 127, size=n))
               for n in (9, 14, 23, 31, 12, 27)]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = pool.generate(prompts, sp)

    # round-robin routing: even inputs on replica 0, odd on replica 1
    assert [o["replica"] for o in outs] == [0, 1, 0, 1, 0, 1]

    # replica devices are disjoint groups of 4
    d0 = set(pool.engines[0].model_runner.mesh.devices.flat)
    d1 = set(pool.engines[1].model_runner.mesh.devices.flat)
    assert len(d0) == len(d1) == 4 and not (d0 & d1)
    # each replica's KV cache lives on ITS devices only
    for eng, dset in ((pool.engines[0], d0), (pool.engines[1], d1)):
        kv = eng.model_runner.cache.kv
        assert set(kv.sharding.device_set) == dset

    # each sub-stream must equal a standalone tp=4 engine run of it
    for r in (0, 1):
        single = LLM(cfg, tensor_parallel_size=4, seed=11, **BASE)
        ref = single.generate(prompts[r::2], sp, use_tqdm=False)
        got = [o for o in outs if o["replica"] == r]
        for a, b in zip(ref, got):
            assert a["token_ids"] == b["token_ids"]


def test_dp_staggered_arrivals_and_mixed_lengths():
    # Requests arrive while replicas are mid-flight; per-request outputs
    # must still be correct and complete (exercise the pool's step loop
    # interleaving, not just batch generate).
    pool = DataParallelPool(tiny_cfg(), dp=2, tensor_parallel_size=4,
                            same_seed=True, seed=5, **BASE)
    rng = np.random.default_rng(3)
    live = {}
    for i, n in enumerate((9, 17, 25)):
        sp = SamplingParams(temperature=0.0, max_tokens=6 + i,
                            ignore_eos=True)
        r, seq = pool.add_request(list(rng.integers(1, 127, size=n)), sp)
        live[(r, seq.seq_id)] = 6 + i
    for _ in range(2):
        pool.step()   # partial progress
    for i, n in enumerate((12, 30)):
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        r, seq = pool.add_request(list(rng.integers(1, 127, size=n)), sp)
        live[(r, seq.seq_id)] = 4
    done = {}
    while not pool.is_finished():
        for r, finished, _ in pool.step():
            for sid, token_ids, _, _ in finished:
                done[(r, sid)] = token_ids
    assert set(done) == set(live)
    for key, want_len in live.items():
        assert len(done[key]) == want_len


def test_dp_least_loaded_routing():
    pool = DataParallelPool(tiny_cfg(), dp=2, tensor_parallel_size=4,
                            **BASE)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    r0, _ = pool.add_request([1, 2, 3], sp)
    r1, _ = pool.add_request([4, 5, 6], sp)
    assert {r0, r1} == {0, 1}  # second request routes to the idle replica
    while not pool.is_finished():
        pool.step()
