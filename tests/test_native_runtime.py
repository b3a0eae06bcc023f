"""Native C++ runtime must be semantically identical to the Python
BlockManager (same tables, same hashes, same refcounts) under randomized
engine-like workloads — including the XXH64 implementation."""

import numpy as np
import pytest

from nanovllm_tpu.engine.block_manager import BlockManager, hash_block
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

native = pytest.importorskip("nanovllm_tpu.native.runtime")
if not native.native_available():
    pytest.skip("no C++ toolchain", allow_module_level=True)

BS = 8


def mkseq(tokens):
    return Sequence(list(tokens), SamplingParams(), block_size=BS)


def test_xxh64_matches_python_xxhash():
    lib = native.get_lib()
    rng = np.random.default_rng(0)
    for n in (1, 7, 8, 31, 32, 100):
        toks = rng.integers(0, 2**31, size=n).astype(np.int64).tolist()
        for prefix in (-1, 12345):
            py = hash_block(toks, prefix)
            # route through a tiny allocate: simpler to compare via block hash
            bm = native.NativeBlockManager(4, n)
            s = mkseq(toks)
            # only full blocks get hashes; n == block_size here
            bm.allocate(s)
            if prefix == -1:
                got = bm.block_hash(s.block_table[0]) % (1 << 64)
                assert got == py % (1 << 64)


def test_equivalence_random_workload():
    rng = np.random.default_rng(1)
    py = BlockManager(64, BS, non_cacheable_token_ids=[999])
    nat = native.NativeBlockManager(64, BS, non_cacheable_token_ids=[999])

    shared = rng.integers(1, 500, size=16).tolist()
    live = []
    for step in range(200):
        op = rng.random()
        if op < 0.4 or not live:
            n = int(rng.integers(3, 40))
            toks = (shared + rng.integers(1, 500, size=n).tolist()
                    if rng.random() < 0.5
                    else rng.integers(1, 500, size=n).tolist())
            if rng.random() < 0.1:
                toks[int(rng.integers(0, len(toks)))] = 999  # non-cacheable
            a, b = mkseq(toks), mkseq(toks)
            if not py.can_allocate(a):
                assert not nat.can_allocate(b)
                continue
            py.allocate(a)
            nat.allocate(b)
            assert a.block_table == b.block_table
            assert a.num_cached_tokens == b.num_cached_tokens
            live.append((a, b))
        elif op < 0.8:
            a, b = live[int(rng.integers(0, len(live)))]
            tok = int(rng.integers(1, 500))
            a.append_token(tok)
            b.token_ids = a.token_ids  # keep twins in sync
            assert py.can_append_slot(a) == nat.can_append_slot(b)
            if not py.can_append_slot(a):
                continue
            py.append_slot(a)
            nat.append_slot(b)
            assert a.block_table == b.block_table
        else:
            i = int(rng.integers(0, len(live)))
            a, b = live.pop(i)
            py.deallocate(a)
            nat.deallocate(b)
        assert py.num_free_blocks == nat.num_free_blocks, f"step {step}"

    # hashes of all live blocks agree (mod 2^64: python keeps unsigned)
    for a, b in live:
        for bid in a.block_table:
            assert py.block_hash(bid) % (1 << 64) == \
                nat.block_hash(bid) % (1 << 64)


def test_prefix_hits_across_implementations_agree():
    py = BlockManager(32, BS)
    nat = native.NativeBlockManager(32, BS)
    base = list(range(100, 100 + 2 * BS))
    for bm in (py, nat):
        s = mkseq(base + [7])
        bm.allocate(s)
        t = mkseq(base + [9])
        bm.allocate(t)
        assert t.num_cached_tokens == 2 * BS
        assert t.block_table[:2] == s.block_table[:2]
