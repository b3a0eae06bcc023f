"""Paged KV-cache block allocator with a hash-chained prefix cache.

Behavioral parity target: reference nanovllm/engine/block_manager.py:26-118 —
  * xxhash64 chained over *full* blocks (partial blocks never get a hash);
  * `allocate` walks a sequence's logical blocks, reusing a physical block on
    (chain-hash, exact-token) match and bumping its refcount; the first miss
    breaks the chain so every later block is freshly allocated (copy-on-write
    effect without copying);
  * generated tokens seal a block when it fills (`append_slot`), publishing
    its hash so later requests can hit it;
  * refcounted deallocate;
  * tokens whose embeddings are request-dependent (vision placeholders) never
    produce cache hits (reference block_manager.py:34-36, 69-74).

Structurally this is a flat-array design (refcounts / hashes / content keys in
parallel lists) rather than per-block objects: cheaper for the per-step host
path and trivially mirrored by the C++ runtime extension later.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Optional

import numpy as np
import xxhash

from nanovllm_tpu.engine.sequence import Sequence

NO_HASH = -1


def hash_block(token_ids: list[int], prefix_hash: int = NO_HASH) -> int:
    """Chain hash of one full block given the previous block's chain hash."""
    h = xxhash.xxh64()
    if prefix_hash != NO_HASH:
        h.update(prefix_hash.to_bytes(8, "little", signed=False))
    h.update(np.asarray(token_ids, dtype=np.int64).tobytes())
    return h.intdigest()


class BlockManager:
    """Allocator over `num_blocks` physical KV pages of `block_size` tokens."""

    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        non_cacheable_token_ids: Optional[Iterable[int]] = None,
    ):
        assert num_blocks > 0 and block_size > 0
        self.num_blocks = num_blocks
        self.block_size = block_size
        self._ref = [0] * num_blocks
        self._hash = [NO_HASH] * num_blocks
        # Exact token content per block, kept to verify hash matches
        # (collision safety) — tuple so comparisons are cheap.
        self._tokens: list[tuple] = [()] * num_blocks
        self._free: deque[int] = deque(range(num_blocks))
        self._hash_to_block: dict[int, int] = {}
        self.non_cacheable = frozenset(non_cacheable_token_ids or ())

    # -- introspection ----------------------------------------------------
    @property
    def num_free_blocks(self) -> int:
        return len(self._free)

    def ref_count(self, block_id: int) -> int:
        return self._ref[block_id]

    def block_hash(self, block_id: int) -> int:
        return self._hash[block_id]

    # -- internals --------------------------------------------------------
    def _take_free(self) -> int:
        bid = self._free.popleft()
        assert self._ref[bid] == 0
        self._ref[bid] = 1
        self._hash[bid] = NO_HASH
        self._tokens[bid] = ()
        return bid

    def _take_specific(self, bid: int) -> None:
        """Revive a cached-but-free block in place (keeps hash/content)."""
        assert self._ref[bid] == 0
        self._free.remove(bid)
        self._ref[bid] = 1

    def _release(self, bid: int) -> None:
        self._ref[bid] -= 1
        assert self._ref[bid] >= 0
        if self._ref[bid] == 0:
            # Keep hash/content: the page may be revived as a prefix hit
            # until its id is reused.
            self._free.append(bid)

    def _publish(self, bid: int, h: int, tokens: list[int]) -> None:
        self._hash[bid] = h
        self._tokens[bid] = tuple(tokens)
        self._hash_to_block[h] = bid

    # -- prefill ----------------------------------------------------------
    def can_allocate(self, seq: Sequence) -> bool:
        return self.num_free_blocks >= seq.num_blocks

    def allocate(self, seq: Sequence) -> None:
        """Build seq.block_table, reusing cached prefix pages where possible."""
        assert not seq.block_table
        seq.num_cached_tokens = 0  # may hold a stale value after preemption
        chain = NO_HASH
        chain_alive = True
        # A hash is only meaningful while the chain from the sequence START is
        # unbroken: after a non-cacheable (e.g. vision) block resets it, a
        # downstream block hashed with a NO_HASH prefix would collide with the
        # hash of the same tokens appearing as a sequence's FIRST block —
        # publishing it would hand later requests KV computed at different
        # positions. Once broken, no later block is hashed or published.
        chain_intact = True
        for i in range(seq.num_blocks):
            tokens = seq.block_tokens(i)
            full = len(tokens) == self.block_size
            cacheable = full and not any(t in self.non_cacheable for t in tokens)
            if cacheable and chain_intact:
                chain = hash_block(tokens, chain)
            else:
                chain = NO_HASH
                chain_intact = False
            hit = NO_HASH
            if chain_alive and cacheable:
                cand = self._hash_to_block.get(chain, -1)
                if cand >= 0 and self._tokens[cand] == tuple(tokens):
                    hit = cand
            if hit >= 0:
                if self._ref[hit] > 0:
                    self._ref[hit] += 1
                else:
                    self._take_specific(hit)
                seq.num_cached_tokens += self.block_size
                seq.block_table.append(hit)
            else:
                chain_alive = False
                bid = self._take_free()
                if chain != NO_HASH:
                    self._publish(bid, chain, tokens)
                seq.block_table.append(bid)
        # A fully-cached prompt still needs one query token so the model can
        # produce the next token: recompute just the last position (the KV
        # rewrite into the shared page is idempotent).
        if seq.num_cached_tokens >= len(seq):
            seq.num_cached_tokens = len(seq) - 1

    # -- decode -----------------------------------------------------------
    # The decode step writes KV for the sequence's *last* token (position
    # len-1) and samples the next one, so a fresh page is needed exactly when
    # that position opens a new block (len % block_size == 1), and the
    # trailing block becomes sealable when it fills (len % block_size == 0).
    # Reservation is TABLE-LENGTH based (grow to ceil(len/bs) pages) so it is
    # idempotent: the async-decode chain reserves one step early
    # (`reserve_for_chain`), and a later append_slot must not double-take.
    def can_append_slot(self, seq: Sequence) -> bool:
        need = -(-len(seq) // self.block_size) - len(seq.block_table)
        return self.num_free_blocks >= max(need, 0)

    def append_slot(self, seq: Sequence) -> None:
        """Reserve cache space for the last token; seal blocks that just
        filled so their hash becomes visible to the prefix cache."""
        need = -(-len(seq) // self.block_size)
        while len(seq.block_table) < need:
            seq.block_table.append(self._take_free())
        if len(seq) % self.block_size == 0:
            self._seal_full_block(seq, seq.num_blocks - 1)

    # -- async-decode chain (speculative one-step-ahead dispatch) ----------
    def can_reserve_for_chain(self, seq: Sequence) -> int:
        """Free pages needed to extend `seq` for ONE more token (position
        len(seq), the token the in-flight step will sample)."""
        need = -(-(len(seq) + 1) // self.block_size) - len(seq.block_table)
        return max(need, 0)

    def reserve_for_chain(self, seq: Sequence) -> None:
        """Take the page for position len(seq) WITHOUT sealing anything —
        the value of the token that fills the trailing block is still on
        device; `seal_filled` publishes it at commit time."""
        need = -(-(len(seq) + 1) // self.block_size)
        while len(seq.block_table) < need:
            seq.block_table.append(self._take_free())

    def seal_filled(self, seq: Sequence) -> None:
        """Chain-commit path: after the real token append, publish the
        just-filled trailing block (what append_slot would have done at the
        next schedule — which the chain already dispatched). Only call when
        the in-flight step contains this sequence's lane: publishing is only
        sound once the step that writes the block's last KV row is
        guaranteed to run before any consumer."""
        if len(seq) % self.block_size == 0:
            self._seal_full_block(seq, seq.num_blocks - 1)

    def _seal_full_block(self, seq: Sequence, logical_idx: int) -> None:
        tokens = seq.block_tokens(logical_idx)
        if len(tokens) != self.block_size:
            return
        if any(t in self.non_cacheable for t in tokens):
            return
        bid = seq.block_table[logical_idx]
        if self._hash[bid] != NO_HASH:
            return  # already sealed (e.g. reused cached page)
        prev = self._hash[seq.block_table[logical_idx - 1]] if logical_idx > 0 else NO_HASH
        if logical_idx > 0 and prev == NO_HASH:
            # Chain broken upstream (non-cacheable block earlier in the
            # sequence): a hash over these tokens alone would be ambiguous
            # with a sequence-initial block — never publish it.
            return
        self._publish(bid, hash_block(tokens, prev), tokens)

    # -- teardown ---------------------------------------------------------
    def deallocate(self, seq: Sequence) -> None:
        for bid in reversed(seq.block_table):
            self._release(bid)
        seq.block_table.clear()
        # num_cached_tokens is intentionally left: finished sequences report
        # it (engine step output), and allocate() resets it on re-entry.
