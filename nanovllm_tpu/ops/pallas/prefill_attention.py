"""Pallas TPU kernel: ragged varlen prefill attention over the paged cache.

Replaces the reference's fused NPU varlen prefill op ("TND" layout causal
attention, reference nanovllm/layers/attention.py:49-59) — but reads K/V from
the paged cache, so prefix-cached prefixes are *not* recomputed and chunked
prefill falls out naturally (the reference recomputes whole prompts,
model_runner.py:238-290).

Grid: one program per query chunk of the chunk-aligned layout
(engine/batch.py): each chunk's CQ tokens belong to a single sequence, whose
pages stream through double-buffered DMA with causal early exit — a chunk
only reads pages up to its own last query position, giving the O(T^2/2)
flash schedule, and per (chunk, page) the MXU sees clean
(G*CQ, hd) x (hd, bs) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.attention import KVCache

NEG_INF = -1e30
N_BUF = 2


def _fold_for(hd: int, kvh: int, group: int):
    """(fold, eff_group) for the MXU tiling: fold = 128/hd kv heads share a
    full-lane tile; hd % 128 == 0 keeps the plain G-stack; odd toy shapes
    fall back to per-head tiles."""
    if hd % 128 == 0:
        return 1, group
    if 128 % hd == 0 and kvh % (128 // hd) == 0:
        return 128 // hd, group
    return 1, 1


def _prefill_kernel(layer_ref, chunk_seg_ref, chunk_pos_ref, tables_ref, ctx_ref,
                    q_ref,                    # (CQ, QH, hd) VMEM
                    *refs,
                    cq: int, bs: int, kvh: int, group: int, hd: int,
                    scale: float, quantized: bool):
    if quantized:
        kv_hbm, sc_hbm, out_ref, kv_buf, sc_buf, sems = refs
    else:
        kv_hbm, out_ref, kv_buf, sems = refs
        sc_hbm = sc_buf = None
    c = pl.program_id(0)
    layer = layer_ref[0]
    seq = chunk_seg_ref[c]
    pos0 = chunk_pos_ref[c]          # absolute position of the chunk's first token
    ctx = ctx_ref[seq]
    # Causal early exit: this chunk's last query is at pos0 + cq - 1.
    kv_needed = jnp.minimum(ctx, pos0 + cq)
    npages = pl.cdiv(kv_needed, bs)

    def page_dmas(slot, j, do_start):
        # Fused layout: one copy per page covers the K and V planes.
        page = tables_ref[seq, j]
        copies = [pltpu.make_async_copy(
            kv_hbm.at[layer, page], kv_buf.at[slot], sems.at[0, slot])]
        if quantized:
            copies.append(pltpu.make_async_copy(
                sc_hbm.at[layer, page], sc_buf.at[slot], sems.at[1, slot]))
        for cp in copies:
            (cp.start if do_start else cp.wait)()

    @pl.when(npages > 0)
    def _():
        page_dmas(0, 0, True)

    # MXU tiling (round-4 shape): tile t covers FOLD adjacent kv heads —
    # their G query heads each — as one (FOLD*G*CQ, FOLD*hd) block-diagonal
    # query against the page's contiguous (bs, FOLD*hd) K columns. Row
    # r = (fi*G + g)*CQ + c holds query head (t*FOLD + fi)*G + g, token c,
    # with its hd values at column block fi — zeros elsewhere make the
    # score dot exact (same trick as the decode kernel's full block-diag).
    # FOLD = 128/hd lifts sub-lane head dims to full 128-lane MXU tiles:
    # hd=64 models previously fell to G=1 per-head (CQ, 64) dots — 14
    # (Qwen2) / 32 (Llama) tiny dots per page; now 1 / 4 full tiles.
    # hd % 128 == 0 keeps FOLD=1 (the existing G-stacked layout).
    fold, eff_group = _fold_for(hd, kvh, group)
    n_tiles = (kvh // fold) * (group // eff_group)
    R = fold * eff_group * cq                   # tile rows
    fhd = fold * hd                             # tile cols
    row_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % cq

    def tile_heads(t):
        """[(row block index, query head, column block fi)] for tile t."""
        kb = t // (group // eff_group)
        g0 = (t % (group // eff_group)) * eff_group
        out = []
        for fi in range(fold):
            for g in range(eff_group):
                out.append((fi * eff_group + g,
                            (kb * fold + fi) * group + g0 + g, fi))
        return out, kb

    def build_q(t):
        """(R, fold*hd) block-diagonal query tile, built once per program.
        For fold > 1 the CALLER pre-placed each head's hd values at its
        column block fi (q_ref is (cq, QH, fold*hd)), so assembly is pure
        row stacking — Mosaic cannot lane-concat sub-128 pieces."""
        heads, _ = tile_heads(t)
        return jnp.concatenate([q_ref[:, h, :] for _, h, _ in heads], axis=0)

    q_tiles = [build_q(t) for t in range(n_tiles)]

    def sc_rows(slot, t, plane):
        """(R, bs) scale rows for tile t: row block fi uses kv head
        kb*fold + fi (+kvh for the V plane)."""
        _, kb = tile_heads(t)
        base = plane * kvh + kb * fold
        if fold == 1:
            return sc_buf[slot, base:base + 1, :]        # (1, bs) bcast
        return jnp.concatenate(
            [jnp.broadcast_to(sc_buf[slot, base + fi:base + fi + 1, :],
                              (eff_group * cq, bs)) for fi in range(fold)],
            axis=0)

    def body(j, carry):
        ms, ls, accs = carry
        slot = j % N_BUF

        @pl.when(j + 1 < npages)
        def _():
            page_dmas((j + 1) % N_BUF, j + 1, True)

        page_dmas(slot, j, False)

        kv_pos = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        live = (kv_pos <= row_pos) & (kv_pos < ctx)       # (R, bs)
        ms2, ls2, accs2 = [], [], []
        for t in range(n_tiles):
            _, kb = tile_heads(t)
            h0 = kb * fold if fold > 1 else t // (group // eff_group)
            cols = slice(h0 * hd, h0 * hd + fhd)
            k_h = kv_buf[slot, :bs, cols]                 # (bs, fold*hd)
            v_h = kv_buf[slot, bs:, cols]
            if quantized:
                k_h = k_h.astype(jnp.bfloat16)
                v_h = v_h.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q_tiles[t], k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # (R, bs)
            if quantized:
                s = s * sc_rows(slot, t, 0)
            s = jnp.where(live, s, NEG_INF)
            m_new = jnp.maximum(ms[t], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(live, p, 0.0)
            corr = jnp.exp(ms[t] - m_new)
            # l sums UNscaled probabilities; v-scale folds into p for the
            # V matmul only.
            ls2.append(ls[t] * corr + jnp.sum(p, axis=-1, keepdims=True))
            if quantized:
                p = p * sc_rows(slot, t, 1)
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (R, fold*hd)
            ms2.append(m_new)
            accs2.append(accs[t] * corr + pv)
        return tuple(ms2), tuple(ls2), tuple(accs2)

    init = (tuple(jnp.full((R, 1), NEG_INF, jnp.float32)
                  for _ in range(n_tiles)),
            tuple(jnp.zeros((R, 1), jnp.float32) for _ in range(n_tiles)),
            tuple(jnp.zeros((R, fhd), jnp.float32) for _ in range(n_tiles)))
    ms, ls, accs = jax.lax.fori_loop(0, npages, body, init)

    # Assemble ONE full-lane store: per-head stores into 3-D (cq, 1, hd)
    # windows are an "unsupported shape cast" in Mosaic for hd % 128 != 0,
    # and sub-lane (hd < 128) column slices of the fold tiles don't
    # lane-concatenate either. fold == 1: concat the (cq, hd) head tiles
    # (full-lane overall). fold > 1: emit each row block's FULL (cq, 128)
    # tile — head h lands at block h (emission order == head order since
    # h = (t*fold + fi)*group + g == block position) with its valid hd
    # columns at offset fi*hd; the jitted CALLER extracts them (XLA
    # handles sub-lane slices fine).
    if fold == 1:
        pieces = [None] * (n_tiles * eff_group)
        for t in range(n_tiles):
            heads, _ = tile_heads(t)
            safe_l = jnp.where(ls[t] > 0.0, ls[t], 1.0)
            o = (accs[t] / safe_l).astype(out_ref.dtype)  # (R, hd)
            for rb, h, _ in heads:
                pieces[h] = o[rb * cq:(rb + 1) * cq]
        out_ref[...] = jnp.concatenate(pieces, axis=1)
    else:
        pieces = []
        for t in range(n_tiles):
            safe_l = jnp.where(ls[t] > 0.0, ls[t], 1.0)
            o = (accs[t] / safe_l).astype(out_ref.dtype)  # (R, fold*hd)
            for rb in range(fold * eff_group):
                pieces.append(o[rb * cq:(rb + 1) * cq])   # (cq, 128) each
        out_ref[...] = jnp.concatenate(pieces, axis=1)


@functools.lru_cache(maxsize=64)
def _build_kernel(T, QH, hd, bs, kvh, group, cq, dtype, scale, quantized,
                  interpret):
    C = T // cq
    fold, _ = _fold_for(hd, kvh, group)
    out_w = QH * hd * fold  # fold > 1 emits full 128-wide per-head blocks
    in_specs = [
        # fold > 1: q arrives pre-folded (caller): (T, QH, fold*hd) with
        # head h's values at column block (h // group) % fold.
        pl.BlockSpec((cq, QH, hd * fold), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((N_BUF, 2 * bs, kvh * hd), jnp.int8 if quantized else dtype),
    ]
    nsems = 1
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((N_BUF, 2 * kvh, bs), jnp.float32))
        nsems = 2
    scratch.append(pltpu.SemaphoreType.DMA((nsems, N_BUF)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(C,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cq, out_w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_prefill_kernel, cq=cq, bs=bs, kvh=kvh, group=group,
                          hd=hd, scale=scale, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, out_w), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )


def ragged_prefill_attention(q, cache: KVCache, chunk_seg, chunk_pos,
                             block_tables, context_lens, layer,
                             *, cq: int, scale: float, interpret: bool = False):
    """q: (T, QH, hd), T == C * cq; chunk_seg/chunk_pos: (C,).
    Returns (T, QH, hd). The pallas_call is memoized on shapes (one Mosaic
    lowering per shape, shared across layers and steps)."""
    T, QH, hd = q.shape
    _, _, bs2, row = cache.kv.shape
    bs = bs2 // 2
    kvh = row // hd
    group = QH // kvh
    out_dtype = jnp.dtype(jnp.bfloat16) if cache.quantized else jnp.dtype(q.dtype)
    kernel = _build_kernel(T, QH, hd, bs, kvh, group, cq, out_dtype,
                           float(scale), cache.quantized, interpret)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    fold, _ = _fold_for(hd, kvh, group)
    q_in = q.astype(out_dtype)
    if fold > 1:
        # Pre-fold the query (XLA side): head h's hd values move to column
        # block fi = (h // group) % fold of a (T, QH, fold*hd) layout, so
        # the kernel's block-diagonal tile assembly is pure row stacking.
        fi = (jnp.arange(QH) // group) % fold            # (QH,)
        sel = fi[:, None] == jnp.arange(fold)[None, :]   # (QH, fold)
        q_in = jnp.where(sel[None, :, :, None], q_in[:, :, None, :],
                         jnp.zeros((), q_in.dtype)).reshape(T, QH, fold * hd)
    args = [layer, chunk_seg, chunk_pos, block_tables, context_lens,
            q_in, cache.kv]
    if cache.quantized:
        args.append(cache.scale)
    out = kernel(*args)
    if fold > 1:
        # fold > 1 kernels emit a full (cq, fold*hd) block per head (head h
        # at block h); its valid hd columns sit at offset fi*hd where
        # fi = (h // group) % fold. Extract with static slices — cheap XLA
        # copies outside Mosaic.
        fhd = fold * hd
        parts = [out[:, h * fhd + ((h // group) % fold) * hd:][:, :hd]
                 for h in range(QH)]
        out = jnp.concatenate(parts, axis=1)
    return out.reshape(T, QH, hd).astype(q.dtype)
