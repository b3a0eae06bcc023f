"""Pallas TPU kernel: paged decode attention (bf16 or quantized-int8 KV).

Replaces the reference's fused NPU op `npu_fused_infer_attention_score_v2`
on the decode path (reference nanovllm/layers/attention.py:63-93): one query
token per sequence slot, keys/values read page-by-page from the paged HBM
cache through the per-slot block table, with per-sequence early exit
(ceil(context/page) pages — the jnp fallback reads every padded column).

Performance shape: decode attention compute is tiny next to its HBM traffic,
so the kernel keeps fixed per-op overheads off the DMA critical path:
  * FUSED K|V pages: the cache stores a page's K and V rows contiguously
    ((L, NB, 2*bs, KVH*hd), ops/attention.py KVCache) as one contiguous HBM
    chunk, streamed as SPLIT K and V copies: the score matmul starts as
    soon as the K half lands while the V half is still in flight (one
    whole-page copy exposed the full transfer on the critical path).
  * SEQ GROUPING: each grid program handles SEQ_GROUP sequences over one
    FLAT iteration counter, so the double-buffered DMA pipeline streams
    ACROSS sequence boundaries. With a per-seq grid, bench-typical contexts
    (2-4 pages -> 1-2 iterations) drained the pipeline at every program:
    measured 23.0 ms (per-seq) vs 19.0 ms pure-DMA floor at S=192
    ctx=1024; the grouped kernel closes most of that gap and helps MORE at
    shorter contexts.
  * GQA heads fold into ONE matmul per page group via a block-diagonal
    query — q_bd (QH, KVH*hd) places head i's vector in its kv-head's column
    block, so q_bd @ K_page^T is exactly the grouped scores. q_bd is built
    (and the per-head output extracted) in the jitted CALLER.
  * Pages stream PAGES_PER_ITER at a time with double-buffered DMA of whole
    pages — few large copies instead of per-head slices.
  * INT8 KV: values are int8 with per-token-per-head scales stored
    TRANSPOSED and fused ((L, NB, 2*KVH, bs) f32, one more DMA per page).
    Because each block-diagonal score row touches exactly one kv head,
    dequantization is exact as a post-matmul elementwise multiply:
    scale_mat = repeat(scales, G, axis=0) applied to the (QH, P*bs) score
    tile (K) and folded into the probabilities right before the V matmul
    (after l is accumulated from the UNscaled probabilities). Halves decode
    HBM traffic and doubles cache capacity.

Layout contract: cache values (L, num_blocks, 2*block_size, KVH*head_dim),
scales (L, num_blocks, 2*KVH, block_size) f32; the kernel gets full stacks
plus the layer index as a prefetched scalar.
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
PAGES_PER_ITER = 2
SEQ_GROUP = 16  # swept 4/8/16/32 at S=192: 16 best (ctx=1024: 17.4 ms)


def _decode_kernel(layer_ref, tables_ref, ctx_ref,   # scalar prefetch (SMEM)
                   qbd_ref,                          # (SG, QH, KVH*hd) VMEM
                   *refs,
                   bs: int, row_dim: int, group: int, scale: float,
                   quantized: bool, pages_per_iter: int = PAGES_PER_ITER,
                   n_buf: int = N_BUF, seq_group: int = SEQ_GROUP):
    if quantized:
        kv_hbm, sc_hbm, out_ref, kv_buf, sc_buf, sems = refs
    else:
        kv_hbm, out_ref, kv_buf, sems = refs
        sc_hbm = sc_buf = None

    P = pages_per_iter
    SG = seq_group
    layer = layer_ref[0]
    base_seq = pl.program_id(0) * SG

    # Flat iteration space over this program's SG sequences: cum[i] is the
    # first flat iteration of seq i; iterating t = 0..total-1 walks every
    # sequence's page groups back to back, so the DMA pipeline never drains
    # at a sequence boundary.
    cum = [jnp.int32(0)]
    for sg in range(SG):
        n_it = pl.cdiv(pl.cdiv(ctx_ref[base_seq + sg], bs), P)
        cum.append(cum[-1] + n_it)
    total = cum[-1]

    def locate(t):
        """flat iter t -> (seq index within group, local iteration)."""
        sg = jnp.int32(0)
        start = jnp.int32(0)
        for i in range(1, SG):
            hit = t >= cum[i]
            sg = jnp.where(hit, i, sg)
            start = jnp.where(hit, cum[i], start)
        return sg, t - start

    # Split K/V copies let the score matmul start while the V half is still
    # in flight — a win for big pages (Qwen3: 512 KiB). For small pages
    # (Qwen2-0.5B: 64 KiB) the extra DMA issue/wait overhead outweighs the
    # overlap: fuse the planes into ONE whole-page copy and make plane 1's
    # wait a no-op. Threshold A/B'd at 256 KiB pages (Llama-3.2 geometry):
    # whole-page won there too, so split only engages at >= 512 KiB.
    page_bytes = 2 * bs * row_dim * (1 if quantized else 2)
    import os

    split_kv = page_bytes >= int(
        os.environ.get("NANOVLLM_SPLIT_KV_MIN", 1 << 19))

    def page_dmas(t, slot, do_start, plane):
        """plane 0: a page's K rows (+ its fused scale page); plane 1: its
        V rows — or, for small pages, one whole-page copy on plane 0."""
        if plane == 1 and not split_kv:
            return
        sg, it = locate(t)
        seq = base_seq + sg
        npages = pl.cdiv(ctx_ref[seq], bs)
        base = it * P
        for p in range(P):
            j = base + p

            @pl.when(j < npages)
            def _():
                page = tables_ref[seq, j]
                if plane == 0:
                    kv_rows = slice(None, bs) if split_kv else slice(None)
                    copies = [pltpu.make_async_copy(
                        kv_hbm.at[layer, page, kv_rows],
                        kv_buf.at[slot, p, kv_rows], sems.at[0, slot, p])]
                    if quantized:
                        copies.append(pltpu.make_async_copy(
                            sc_hbm.at[layer, page], sc_buf.at[slot, p],
                            sems.at[2, slot, p]))
                else:
                    copies = [pltpu.make_async_copy(
                        kv_hbm.at[layer, page, bs:],
                        kv_buf.at[slot, p, bs:], sems.at[1, slot, p])]
                for c in copies:
                    (c.start if do_start else c.wait)()

    # Dead sequences (ctx == 0, padding lanes) produce no iterations: zero
    # the whole out block up front, live rows overwrite at their finalize.
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # Pipeline prologue: keep n_buf - 1 iterations' DMAs in flight.
    for t0 in range(n_buf - 1):
        @pl.when(t0 < total)
        def _(t0=t0):
            page_dmas(t0, t0, True, 0)
            page_dmas(t0, t0, True, 1)

    nq = qbd_ref.shape[1]
    rows = P * bs
    kvh = sc_buf.shape[-2] // 2 if quantized else 0

    def scale_mat(slot, plane):
        # (P, KVH, bs) f32 -> (QH, P*bs): concat pages on the lane axis, then
        # TILE kv-head rows G times (pltpu.repeat tiles: [h0..hK, h0..hK, ..])
        # — q_bd rows are permuted to the matching order (row r <-> kv head
        # r % KVH) by the caller. Plane slice: K scales are rows [:KVH] of
        # the fused (2*KVH, bs) page, V scales rows [KVH:].
        sc = jnp.concatenate(
            [sc_buf[slot, p, plane * kvh:(plane + 1) * kvh] for p in range(P)],
            axis=1)
        return pltpu.repeat(sc, group, axis=0)

    def body(t, carry):
        m, l, acc = carry
        slot = t % n_buf

        nxt = t + n_buf - 1

        @pl.when(nxt < total)
        def _():
            page_dmas(nxt, nxt % n_buf, True, 0)
            page_dmas(nxt, nxt % n_buf, True, 1)

        sg, it = locate(t)
        seq = base_seq + sg
        ctx = ctx_ref[seq]

        # First iteration of a sequence: reset the flash state.
        fresh = it == 0
        m = jnp.where(fresh, NEG_INF, m)
        l = jnp.where(fresh, 0.0, l)
        acc = jnp.where(fresh, 0.0, acc)

        page_dmas(t, slot, False, 0)

        q_bd = qbd_ref[sg]                             # (QH, KVH*hd)
        k_flat = kv_buf[slot, :, :bs].reshape(rows, row_dim)
        if quantized:
            k_flat = k_flat.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q_bd, k_flat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (QH, P*bs)
        if quantized:
            s = s * scale_mat(slot, 0)
        rem = ctx - it * rows
        live = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) < rem
        s = jnp.where(live, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p_ = jnp.exp(s - m_new)
        p_ = jnp.where(live, p_, 0.0)
        corr = jnp.exp(m - m_new)
        # l accumulates UNscaled probabilities (the softmax denominator);
        # the per-column v-scale is folded into p only for the V matmul.
        l = l * corr + jnp.sum(p_, axis=-1, keepdims=True)
        page_dmas(t, slot, False, 1)  # V rows: overlapped the score work
        v_flat = kv_buf[slot, :, bs:].reshape(rows, row_dim)
        if quantized:
            v_flat = v_flat.astype(jnp.bfloat16)
            # Re-mask AFTER the v-scale multiply: columns past the context
            # carry never-DMA'd scale garbage, and 0 * NaN = NaN would
            # poison the accumulator. int8 V rows need NO row mask: any int8
            # bit pattern converts to a FINITE bf16, and p_ is exactly 0 at
            # dead columns — the row mask was a full VPU pass over the
            # biggest tile in the loop (~1/3 of the per-iteration floor at
            # Qwen2 geometry).
            p_ = jnp.where(live, p_ * scale_mat(slot, 1), 0.0)
        else:
            # bf16 rows past the context come from never-DMAed buffer slots;
            # zero them so 0 * garbage (possibly NaN) cannot poison the
            # accumulator.
            live_rows = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) < rem
            v_flat = jnp.where(live_rows, v_flat,
                               jnp.zeros((), v_flat.dtype))
        pv = jax.lax.dot_general(
            p_.astype(v_flat.dtype), v_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (QH, KVH*hd)
        acc = acc * corr + pv

        # Last iteration of this sequence: normalize and emit its out row.
        n_it = pl.cdiv(pl.cdiv(ctx, bs), P)

        @pl.when(it == n_it - 1)
        def _():
            safe_l = jnp.where(l > 0.0, l, 1.0)
            out_ref[sg] = (acc / safe_l).astype(out_ref.dtype)

        return m_new, l, acc

    init = (jnp.full((nq, 1), NEG_INF, jnp.float32),
            jnp.zeros((nq, 1), jnp.float32),
            jnp.zeros((nq, row_dim), jnp.float32))
    jax.lax.fori_loop(0, total, body, init)


@functools.lru_cache(maxsize=64)
def _build_kernel(S, QH, hd, bs, row_dim, group, dtype, scale, quantized,
                  interpret, pages_per_iter=PAGES_PER_ITER, n_buf=N_BUF,
                  seq_group=SEQ_GROUP):
    kvh = row_dim // hd
    SG = seq_group
    in_specs = [
        pl.BlockSpec((SG, QH, row_dim), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    scratch = [
        pltpu.VMEM((n_buf, pages_per_iter, 2 * bs, row_dim),
                   jnp.int8 if quantized else dtype),
    ]
    nsems = 2  # split K / V copies of the fused page
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(
            pltpu.VMEM((n_buf, pages_per_iter, 2 * kvh, bs), jnp.float32))
        nsems = 3  # + scale page
    scratch.append(pltpu.SemaphoreType.DMA((nsems, n_buf, pages_per_iter)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S // SG,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((SG, QH, row_dim), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_decode_kernel, bs=bs, row_dim=row_dim, group=group,
                          scale=scale, quantized=quantized,
                          pages_per_iter=pages_per_iter, n_buf=n_buf,
                          seq_group=SG),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, QH, row_dim), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )


def paged_decode_attention(q, cache: KVCache, block_tables, context_lens,
                           layer, *, scale: float, interpret: bool = False,
                           pages_per_iter: int | None = None,
                           n_buf: int = N_BUF, seq_group: int | None = None):
    """q: (S, QH, hd); cache values (L, NB, 2*bs, KVH*hd); layer: () int32.
    Returns (S, QH, hd). Slots with context_len == 0 yield zeros.

    The pallas_call object is memoized on shapes: one Mosaic lowering serves
    every layer of every step (a fresh partial() per call re-lowered the
    same kernel dozens of times and dominated compile time)."""
    S, QH, hd = q.shape
    L, NB, bs2, row_dim = cache.kv.shape
    bs = bs2 // 2
    kvh = row_dim // hd
    group = QH // kvh
    if pages_per_iter is None:
        # ~512 KiB of KV per loop iteration amortizes the fixed
        # per-iteration cost (DMA issue + waits + flash-state ops) for
        # small-row models (Qwen2-0.5B: 64 KiB pages -> P=8, measured 29%
        # faster than P=2 at ctx=2048) without bloating VMEM for big ones
        # (Qwen3: 512 KiB pages -> P=2; P=4 and P=16 measured worse).
        page_bytes = 2 * bs * row_dim * cache.kv.dtype.itemsize
        pages_per_iter = min(8, max(2, (1 << 19) // page_bytes))
    if seq_group is None:
        seq_group = next(g for g in (SEQ_GROUP, 8, 4, 2, 1) if S % g == 0)

    # Block-diagonal query, built under XLA. Rows are PERMUTED to tiled
    # kv-head order — row r holds original head perm[r] = (r % KVH) * G +
    # r // KVH and its kv head is r % KVH — so the kernel's tiled scale
    # matrix (pltpu.repeat) lines up exactly.
    perm = [(r % kvh) * group + r // kvh for r in range(QH)]
    q_perm = q[:, jnp.asarray(perm), :]
    sel = (jnp.arange(QH) % kvh)[:, None] == jnp.arange(kvh)[None, :]
    q_bd = jnp.where(sel[:, :, None], q_perm[:, :, None, :],
                     jnp.zeros((), q.dtype)).reshape(S, QH, row_dim)
    out_dtype = jnp.dtype(jnp.bfloat16) if cache.quantized else jnp.dtype(q.dtype)

    kernel = _build_kernel(S, QH, hd, bs, row_dim, group, out_dtype,
                           float(scale), cache.quantized, interpret,
                           pages_per_iter, n_buf, seq_group)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    args = [layer, block_tables, context_lens, q_bd.astype(out_dtype),
            cache.kv]
    if cache.quantized:
        args.append(cache.scale)
    out_flat = kernel(*args)
    # Original head i sits at permuted row (i % G) * KVH + i // G, in its
    # kv-head's column block: static slices + concat (a take_along_axis here
    # lowers to a catastrophically slow XLA gather).
    parts = [out_flat[:, (i % group) * kvh + i // group, None,
                      (i // group) * hd:(i // group + 1) * hd]
             for i in range(QH)]
    return jnp.concatenate(parts, axis=1).astype(q.dtype)
