"""Allocator + prefix-cache invariants (parity with reference ut/test_block_manager.py)."""

import pytest

from nanovllm_tpu.engine.block_manager import BlockManager, hash_block, NO_HASH
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

BS = 4


def make_seq(tokens, block_size=BS):
    return Sequence(list(tokens), SamplingParams(), block_size=block_size)


def test_allocate_deallocate_bookkeeping():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = make_seq(range(10))  # 3 blocks (4+4+2)
    assert bm.can_allocate(seq)
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert bm.num_free_blocks == 5
    assert all(bm.ref_count(b) == 1 for b in seq.block_table)
    bm.deallocate(seq)
    assert bm.num_free_blocks == 8
    assert seq.block_table == []



def test_prefix_cache_hit_shares_blocks():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = make_seq([1, 2, 3, 4, 5, 6])
    bm.allocate(a)
    b = make_seq([1, 2, 3, 4, 9, 9])
    bm.allocate(b)
    # First full block identical -> shared; tails distinct.
    assert b.block_table[0] == a.block_table[0]
    assert b.block_table[1] != a.block_table[1]
    assert bm.ref_count(a.block_table[0]) == 2
    assert b.num_cached_tokens == BS
    assert a.num_cached_tokens == 0


def test_chain_break_stops_later_hits():
    bm = BlockManager(num_blocks=16, block_size=BS)
    a = make_seq(range(12))  # 3 full blocks
    bm.allocate(a)
    # Same block 0 and block 2 content, different block 1: only block 0 shared.
    tokens = list(range(4)) + [99, 98, 97, 96] + list(range(8, 12))
    b = make_seq(tokens)
    bm.allocate(b)
    assert b.block_table[0] == a.block_table[0]
    assert b.block_table[1] != a.block_table[1]
    assert b.block_table[2] != a.block_table[2]  # chain broken upstream
    assert b.num_cached_tokens == BS


def test_append_slot_boundaries_and_sealing():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = make_seq([1, 2, 3])  # partial block
    bm.allocate(seq)
    assert len(seq.block_table) == 1

    seq.append_token(4)  # len=4 -> block full; decode writes pos 3
    assert bm.can_append_slot(seq)
    bm.append_slot(seq)  # seals block 0
    sealed = seq.block_table[0]
    assert bm.block_hash(sealed) != NO_HASH
    assert bm.block_hash(sealed) == hash_block([1, 2, 3, 4])

    seq.append_token(5)  # len=5 -> pos 4 opens a new block
    free_before = bm.num_free_blocks
    bm.append_slot(seq)
    assert len(seq.block_table) == 2
    assert bm.num_free_blocks == free_before - 1

    seq.append_token(6)  # len=6 -> mid-block, no-op
    bm.append_slot(seq)
    assert len(seq.block_table) == 2


def test_sealed_decode_block_is_prefix_hit_for_new_seq():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = make_seq([1, 2, 3])
    bm.allocate(seq)
    seq.append_token(4)
    bm.append_slot(seq)  # seal [1,2,3,4]
    other = make_seq([1, 2, 3, 4, 7])
    bm.allocate(other)
    assert other.block_table[0] == seq.block_table[0]
    assert other.num_cached_tokens == BS
    assert bm.ref_count(seq.block_table[0]) == 2


def test_refcounted_free_of_shared_blocks():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = make_seq([1, 2, 3, 4, 5])
    bm.allocate(a)
    b = make_seq([1, 2, 3, 4, 6])
    bm.allocate(b)
    shared = a.block_table[0]
    assert bm.ref_count(shared) == 2
    bm.deallocate(a)
    assert bm.ref_count(shared) == 1
    free_before = bm.num_free_blocks
    bm.deallocate(b)
    assert bm.ref_count(shared) == 0
    assert bm.num_free_blocks == free_before + 2


def test_cached_free_block_revived_on_hit():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = make_seq([1, 2, 3, 4, 5])
    bm.allocate(a)
    block0 = a.block_table[0]
    bm.deallocate(a)  # pages free but hash retained
    b = make_seq([1, 2, 3, 4, 9])
    bm.allocate(b)
    assert b.block_table[0] == block0
    assert b.num_cached_tokens == BS


def test_non_cacheable_tokens_never_hit():
    bm = BlockManager(num_blocks=8, block_size=BS, non_cacheable_token_ids=[42])
    a = make_seq([1, 42, 3, 4, 5])
    bm.allocate(a)
    b = make_seq([1, 42, 3, 4, 5])
    bm.allocate(b)
    assert b.block_table[0] != a.block_table[0]
    assert b.num_cached_tokens == 0


def test_fully_cached_prompt_keeps_one_query_token():
    bm = BlockManager(num_blocks=8, block_size=BS)
    a = make_seq([1, 2, 3, 4, 5, 6, 7, 8])  # two full blocks
    bm.allocate(a)
    b = make_seq([1, 2, 3, 4, 5, 6, 7, 8])
    bm.allocate(b)
    assert b.block_table == a.block_table
    assert b.num_cached_tokens == len(b) - 1  # one token left to recompute


def test_broken_chain_never_publishes_ambiguous_hash():
    # After a non-cacheable (vision) block resets the chain, a downstream
    # block's tokens hash identically to the same tokens at sequence START —
    # publishing it would let a fresh request reuse KV computed at different
    # positions. Both the allocate() path and the decode sealing path must
    # refuse to publish such blocks.
    bm = BlockManager(num_blocks=16, block_size=BS, non_cacheable_token_ids=[42])
    a = make_seq([42, 42, 42, 42, 1, 2, 3, 4])  # block0 vision, block1 [1,2,3,4]
    bm.allocate(a)
    assert bm.block_hash(a.block_table[1]) == NO_HASH  # not published
    b = make_seq([1, 2, 3, 4, 9])  # same tokens as a's block1, but position 0
    bm.allocate(b)
    assert b.block_table[0] != a.block_table[1]
    assert b.num_cached_tokens == 0
    bm.deallocate(b)

    # Decode sealing path: fill a block whose upstream chain is broken.
    c = make_seq([42, 42, 42, 42, 5, 6, 7])
    bm.allocate(c)
    c.append_token(8)  # len 8 -> seals logical block 1 ([5,6,7,8])
    bm.append_slot(c)
    assert bm.block_hash(c.block_table[1]) == NO_HASH
    d = make_seq([5, 6, 7, 8, 9])
    bm.allocate(d)
    assert d.block_table[0] != c.block_table[1]
    assert d.num_cached_tokens == 0


def test_oom_raises_not_corrupts():
    bm = BlockManager(num_blocks=2, block_size=BS)
    a = make_seq(range(8))
    bm.allocate(a)
    c = make_seq(range(100, 108))
    assert not bm.can_allocate(c)
    with pytest.raises(IndexError):
        bm.allocate(c)
