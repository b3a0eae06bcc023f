"""Replicated-state-machine invariant (parity with reference
ut/test_multi_rank_block_manager.py): independent BlockManager replicas fed
identical inputs must produce bit-identical block tables — this is what lets
every host in a multi-host deployment derive the same schedule without any
control-plane traffic."""

import pytest

from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

BS = 8


def twin_seqs(tokens):
    return (Sequence(list(tokens), SamplingParams(), block_size=BS),
            Sequence(list(tokens), SamplingParams(), block_size=BS))


def test_identical_tables_after_prefill():
    bms = [BlockManager(16, BS) for _ in range(2)]
    prompts = [list(range(20)), list(range(5, 25)), list(range(20))]
    tables = [[], []]
    for tokens in prompts:
        for r, bm in enumerate(bms):
            s = Sequence(list(tokens), SamplingParams(), block_size=BS)
            bm.allocate(s)
            tables[r].append((list(s.block_table), s.num_cached_tokens))
    assert tables[0] == tables[1]
    assert bms[0]._hash_to_block == bms[1]._hash_to_block


def test_identical_tables_after_decode_growth():
    bms = [BlockManager(16, BS) for _ in range(2)]
    seqs = []
    for bm in bms:
        s = Sequence(list(range(7)), SamplingParams(), block_size=BS)
        bm.allocate(s)
        seqs.append(s)
    for step in range(20):
        for bm, s in zip(bms, seqs):
            s.append_token(100 + step)
            bm.append_slot(s)
    assert seqs[0].block_table == seqs[1].block_table
    assert bms[0]._hash_to_block == bms[1]._hash_to_block
    assert bms[0].num_free_blocks == bms[1].num_free_blocks


def test_oom_raises_never_emits_bad_ids():
    bm = BlockManager(2, BS)
    s = Sequence(list(range(16)), SamplingParams(), block_size=BS)
    bm.allocate(s)
    t = Sequence(list(range(100, 116)), SamplingParams(), block_size=BS)
    assert not bm.can_allocate(t)
    with pytest.raises(IndexError):
        bm.allocate(t)
    assert all(0 <= b < 2 for b in s.block_table)
