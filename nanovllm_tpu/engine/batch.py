"""Host-side batch preparation: scheduler output -> fixed-shape numpy arrays.

Parity target: reference nanovllm/engine/model_runner.py:238-366
(prepare_prefill / prepare_decode / prepare_decode_padding). Differences:
  * ONE layout serves prefill and decode (flattened varlen tokens + per-slot
    page tables); decode is the T == S special case. The reference needed a
    separate padded prep path purely for graph mode — under XLA fixed padded
    shapes are the only path.
  * Prefill computes just the uncached suffix (reference rebuilds the whole
    prompt, model_runner.py:248-252).
  * Padded lanes write their (garbage) KV into a reserved scratch page — the
    same dummy-slot trick as reference model_runner.py:309-311 — and read
    from slots whose context_len masks everything out.

Shapes are quantized: T -> the configured token buckets, S -> max_num_seqs,
page-table width -> max_model_len / block_size. One jit compilation per
(T bucket, phase).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence as Seq

import numpy as np

from nanovllm_tpu.engine.sequence import Sequence


@dataclass
class HostBatch:
    """Fixed-shape arrays ready for device transfer, plus host-only truths."""

    input_ids: np.ndarray     # (T,) int32
    seg_ids: np.ndarray       # (T,) int32
    positions: np.ndarray     # (T,) int32
    slot_mapping: np.ndarray  # (T,) int32
    block_tables: np.ndarray  # (S, maxB) int32
    context_lens: np.ndarray  # (S,) int32
    last_token_idx: np.ndarray  # (S,) int32
    chunk_seg: np.ndarray     # (T // CQ,) int32: query chunk -> slot
    temperatures: np.ndarray  # (S,) float32
    top_k: np.ndarray         # (S,) int32, 0 = disabled
    top_p: np.ndarray         # (S,) float32, 1.0 = disabled
    num_seqs: int             # live slots
    num_tokens: int           # live tokens
    is_prefill: bool
    seq_token_offsets: list = None  # per-seq start row in the token layout
    phase: str = None         # "prefill" | "decode" | "mixed"
    decode_ctx: np.ndarray = None  # (S,) int32, mixed steps only
    gather_idx: np.ndarray = None  # (T,) int32, chained plans: -1 = host row


@dataclass
class StepPlan:
    """One engine step's work: prefill windows + decode lanes.

    Chunked-prefill interleaving (absent in the reference — its prefills
    monopolize whole steps, the round-1 TTFT p99 pathology): a step can carry
    partial prompt windows AND single-token decode lanes; the unified token
    layout runs both through one forward pass with the attention split per
    region. `prefill` entries are (seq, start, span): KV rows
    [start, start+span) get computed this step; the sequence emits a token
    only when start+span == len(seq)."""

    prefill: list            # [(Sequence, start, span)]
    decode: list             # [Sequence]
    phase: str               # "prefill" | "decode" | "mixed"
    # True for async-decode chain steps: dispatched one step ahead (before
    # the previous step's tokens reached the host), with the KV write for
    # each lane's newest position already enqueued on device — which is what
    # makes commit-time block sealing sound (scheduler.postprocess_plan).
    chained: bool = False

    @property
    def seqs(self):
        return [s for s, _, _ in self.prefill] + list(self.decode)

    @property
    def is_empty(self):
        return not self.prefill and not self.decode


def pick_bucket(n: int, buckets: Seq[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} tokens exceed largest bucket {buckets[-1]}")


def align_up(n: int, m: int) -> int:
    return -(-n // m) * m


def prefill_cost(seq: Sequence, chunk: int) -> int:
    """Device tokens a sequence's prefill will occupy (chunk-aligned).
    The scheduler budgets with this so batches always fit a bucket."""
    return align_up(len(seq) - seq.num_cached_tokens, chunk)


def prepare_plan(
    plan: StepPlan,
    *,
    block_size: int,
    dummy_slot: int,
    max_num_seqs: int,
    blocks_per_seq: int,
    token_buckets: Seq[int],
    chunk: int = 128,
    virtual_lanes: list = None,
    seq_buckets: Seq[int] = None,
) -> HostBatch:
    """StepPlan -> fixed-shape arrays. Token layout: [prefill region | decode
    region]. The prefill region is the chunk-aligned windows (bucketed); the
    decode region, present only in mixed/decode phases, is S single-token
    rows where row Tp+i belongs to slot i (padding rows for prefilling
    slots carry decode_ctx 0 so the decode kernel skips them).

    virtual_lanes (chained plans): list aligned with plan.decode; entry j is
    the PREVIOUS step's slot index whose sampled token is lane j's input
    (the lane then runs at virtual length len+1 — the token is appended at
    the previous step's commit), or -1 for a lane whose input token is
    already on the host. Fills batch.gather_idx: (T,) int32, -1 = host
    input_ids row, >=0 = gather from the in-flight step's token array."""
    n_p, n_d = len(plan.prefill), len(plan.decode)
    n = n_p + n_d
    assert 0 < n <= max_num_seqs
    # PURE-decode steps pad their lane axis to the smallest configured
    # bucket >= live lanes instead of always max_num_seqs (run tails and
    # low-concurrency serving stop paying full-batch latency). Prefill and
    # mixed steps keep the full S: bucketing them would multiply the jit
    # shape count (token bucket x seq bucket) for phases that only occur
    # while lanes are full anyway.
    S = max_num_seqs
    if seq_buckets and n_p == 0 and n_d > 0:
        S = pick_bucket(n, seq_buckets)

    if n_p:
        n_ptok = sum(align_up(span, chunk) for _, _, span in plan.prefill)
        Tp = pick_bucket(n_ptok, token_buckets)
    else:
        n_ptok = 0
        Tp = 0
    has_decode = n_d > 0
    T = Tp + (S if has_decode else 0)

    pad_slot = n if n < S else 0
    input_ids = np.zeros(T, dtype=np.int32)
    seg_ids = np.full(T, pad_slot, dtype=np.int32)
    positions = np.zeros(T, dtype=np.int32)
    slot_mapping = np.full(T, dummy_slot, dtype=np.int32)
    block_tables = np.zeros((S, blocks_per_seq), dtype=np.int32)
    context_lens = np.zeros(S, dtype=np.int32)
    last_token_idx = np.zeros(S, dtype=np.int32)
    chunk_seg = np.full(max(Tp // chunk, 1), pad_slot, dtype=np.int32)
    temperatures = np.ones(S, dtype=np.float32)
    top_k = np.zeros(S, dtype=np.int32)
    top_p = np.ones(S, dtype=np.float32)
    # decode_ctx only exists for MIXED steps: a pure decode step's
    # context_lens IS the decode context (and adding the array to pure
    # decode batches would change the jit pytree and fork the compile).
    mixed = has_decode and n_p > 0
    decode_ctx = np.zeros(S, dtype=np.int32) if mixed else None
    gather_idx = None
    if virtual_lanes is not None:
        assert len(virtual_lanes) == n_d
        gather_idx = np.full(T, -1, dtype=np.int32)

    def fill_slot(i, seq):
        table = seq.block_table
        block_tables[i, : len(table)] = table
        temperatures[i] = seq.temperature
        top_k[i] = getattr(seq, "top_k", 0)
        top_p[i] = getattr(seq, "top_p", 1.0)

    offsets = []
    t = 0
    for i, (seq, start, span) in enumerate(plan.prefill):
        fill_slot(i, seq)
        # KV visible to this window = everything computed through its end.
        context_lens[i] = start + span
        offsets.append(t)
        table = seq.block_table
        input_ids[t: t + span] = seq.token_ids[start: start + span]
        positions[t: t + span] = np.arange(start, start + span, dtype=np.int32)
        seg_ids[t: t + span] = i
        pos = np.arange(start, start + span, dtype=np.int64)
        blocks = np.asarray(table, dtype=np.int64)[pos // block_size]
        slot_mapping[t: t + span] = blocks * block_size + pos % block_size
        last_token_idx[i] = t + span - 1
        aligned = align_up(span, chunk)
        chunk_seg[t // chunk: (t + aligned) // chunk] = i
        t += aligned

    for j, seq in enumerate(plan.decode):
        i = n_p + j
        fill_slot(i, seq)
        virt = virtual_lanes is not None and virtual_lanes[j] >= 0
        L = len(seq) + (1 if virt else 0)
        context_lens[i] = L
        if mixed:
            decode_ctx[i] = L
        row = Tp + i
        offsets.append(row)
        if virt:
            gather_idx[row] = virtual_lanes[j]
        else:
            input_ids[row] = seq.last_token
        pos = L - 1
        positions[row] = pos
        seg_ids[row] = i
        slot_mapping[row] = seq.block_table[pos // block_size] * block_size \
            + pos % block_size
        last_token_idx[i] = row

    return HostBatch(
        input_ids=input_ids,
        seg_ids=seg_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        block_tables=block_tables,
        context_lens=context_lens,
        last_token_idx=last_token_idx,
        chunk_seg=chunk_seg,
        temperatures=temperatures,
        top_k=top_k,
        top_p=top_p,
        num_seqs=n,
        num_tokens=n_ptok + n_d,
        is_prefill=plan.phase == "prefill",
        seq_token_offsets=offsets,
        phase=plan.phase,
        decode_ctx=decode_ctx,
        gather_idx=gather_idx,
    )


def prepare_chain_batch(
    seqs: list[Sequence],
    *,
    block_size: int,
    dummy_slot: int,
    max_num_seqs: int,
    blocks_per_seq: int,
    chunk: int = 128,
    seq_buckets: Seq[int] = None,
) -> HostBatch:
    """Decode batch for the async-decode chain: built BEFORE the previous
    step's sampled tokens reach the host, at each sequence's VIRTUAL length
    len(seq)+1 (the committed length it will have once the pending step's
    token is appended). Everything here is value-independent — positions,
    slots and page tables are pure length arithmetic (pages already grown by
    reserve_for_chain); `input_ids` are placeholders that the runner
    overrides on device with the pending step's token array, so the chain
    never round-trips tokens through the host."""
    n = len(seqs)
    assert 0 < n <= max_num_seqs
    S = pick_bucket(n, seq_buckets) if seq_buckets else max_num_seqs

    pad_slot = n if n < S else 0
    input_ids = np.zeros(S, dtype=np.int32)
    seg_ids = np.full(S, pad_slot, dtype=np.int32)
    positions = np.zeros(S, dtype=np.int32)
    slot_mapping = np.full(S, dummy_slot, dtype=np.int32)
    block_tables = np.zeros((S, blocks_per_seq), dtype=np.int32)
    context_lens = np.zeros(S, dtype=np.int32)
    last_token_idx = np.zeros(S, dtype=np.int32)
    chunk_seg = np.full(max(S // chunk, 1), pad_slot, dtype=np.int32)
    temperatures = np.ones(S, dtype=np.float32)
    top_k = np.zeros(S, dtype=np.int32)
    top_p = np.ones(S, dtype=np.float32)

    for i, seq in enumerate(seqs):
        table = seq.block_table
        block_tables[i, : len(table)] = table
        L1 = len(seq) + 1
        context_lens[i] = L1
        temperatures[i] = seq.temperature
        top_k[i] = getattr(seq, "top_k", 0)
        top_p[i] = getattr(seq, "top_p", 1.0)
        pos = L1 - 1
        positions[i] = pos
        seg_ids[i] = i
        slot_mapping[i] = table[pos // block_size] * block_size \
            + pos % block_size
        last_token_idx[i] = i

    return HostBatch(
        input_ids=input_ids,
        seg_ids=seg_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        block_tables=block_tables,
        context_lens=context_lens,
        last_token_idx=last_token_idx,
        chunk_seg=chunk_seg,
        temperatures=temperatures,
        top_k=top_k,
        top_p=top_p,
        num_seqs=n,
        num_tokens=n,
        is_prefill=False,
        seq_token_offsets=list(range(n)),
        phase="decode",
    )


def prepare_batch(
    seqs: list[Sequence],
    is_prefill: bool,
    *,
    block_size: int,
    dummy_slot: int,
    max_num_seqs: int,
    blocks_per_seq: int,
    token_buckets: Seq[int],
    chunk: int = 128,
    seq_buckets: Seq[int] = None,
) -> HostBatch:
    n = len(seqs)
    assert 0 < n <= max_num_seqs
    S = max_num_seqs
    if is_prefill:
        n_tokens = sum(prefill_cost(s, chunk) for s in seqs)
        T = pick_bucket(n_tokens, token_buckets)
    else:
        if seq_buckets:
            S = pick_bucket(n, seq_buckets)
        n_tokens = n
        T = S

    # Padding lanes point at the first empty slot when one exists (its
    # context_len 0 masks every key); with all slots live they fall back to
    # slot 0 — harmless garbage, never read.
    pad_slot = n if n < S else 0
    input_ids = np.zeros(T, dtype=np.int32)
    seg_ids = np.full(T, pad_slot, dtype=np.int32)
    positions = np.zeros(T, dtype=np.int32)
    slot_mapping = np.full(T, dummy_slot, dtype=np.int32)
    block_tables = np.zeros((S, blocks_per_seq), dtype=np.int32)
    context_lens = np.zeros(S, dtype=np.int32)
    last_token_idx = np.zeros(S, dtype=np.int32)
    chunk_seg = np.full(max(T // chunk, 1), pad_slot, dtype=np.int32)
    temperatures = np.ones(S, dtype=np.float32)
    top_k = np.zeros(S, dtype=np.int32)
    top_p = np.ones(S, dtype=np.float32)

    t = 0
    offsets = []
    for i, seq in enumerate(seqs):
        table = seq.block_table
        block_tables[i, : len(table)] = table
        context_lens[i] = len(seq)
        temperatures[i] = seq.temperature
        top_k[i] = getattr(seq, "top_k", 0)
        top_p[i] = getattr(seq, "top_p", 1.0)
        offsets.append(t if is_prefill else i)
        if is_prefill:
            start = seq.num_cached_tokens
            span = len(seq) - start
            input_ids[t: t + span] = seq.token_ids[start:]
            positions[t: t + span] = np.arange(start, len(seq), dtype=np.int32)
            seg_ids[t: t + span] = i
            pos = np.arange(start, len(seq), dtype=np.int64)
            blocks = np.asarray(table, dtype=np.int64)[pos // block_size]
            slot_mapping[t: t + span] = blocks * block_size + pos % block_size
            last_token_idx[i] = t + span - 1
            aligned = align_up(span, chunk)
            chunk_seg[t // chunk: (t + aligned) // chunk] = i
            # intra-sequence padding lanes up to the chunk boundary: the
            # seg stays on this sequence (chunk invariant) but their KV
            # writes go to the scratch page and outputs are never read.
            t += aligned
        else:
            input_ids[i] = seq.last_token
            pos = len(seq) - 1
            positions[i] = pos
            seg_ids[i] = i
            slot_mapping[i] = table[pos // block_size] * block_size + pos % block_size
            last_token_idx[i] = i

    return HostBatch(
        input_ids=input_ids,
        seg_ids=seg_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        block_tables=block_tables,
        context_lens=context_lens,
        last_token_idx=last_token_idx,
        chunk_seg=chunk_seg,
        temperatures=temperatures,
        top_k=top_k,
        top_p=top_p,
        num_seqs=n,
        num_tokens=n_tokens,
        is_prefill=is_prefill,
        seq_token_offsets=offsets,
    )
