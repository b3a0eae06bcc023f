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

    # Token r of a G-stacked (group*cq, ...) tile sits at absolute position
    # pos0 + (r % cq): the G query heads of one kv head are stacked on the
    # sublane axis so the MXU sees one (G*CQ, hd) x (hd, bs) dot per kv head
    # instead of G separate (CQ, hd) dots — half the loop iterations and
    # twice the tile height at GQA group 2. Mosaic cannot lower the stacked
    # form's sliced output store for sub-lane-tile head dims (hd % 128 != 0:
    # "unsupported shape cast"), so tiny-model shapes keep G = 1 groups of
    # the per-head layout (eff_group below; identical math).
    eff_group = group if hd % 128 == 0 else 1
    n_tiles = kvh * (group // eff_group)
    gq = eff_group * cq
    row_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (gq, 1), 0) % cq

    def body(j, carry):
        ms, ls, accs = carry
        slot = j % N_BUF

        @pl.when(j + 1 < npages)
        def _():
            page_dmas((j + 1) % N_BUF, j + 1, True)

        page_dmas(slot, j, False)

        kv_pos = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        live = (kv_pos <= row_pos) & (kv_pos < ctx)       # (G*CQ, bs)
        ms2, ls2, accs2 = [], [], []
        for t in range(n_tiles):
            h = t // (group // eff_group)
            g0 = (t % (group // eff_group)) * eff_group
            q_h = jnp.concatenate(
                [q_ref[:, h * group + g0 + g, :] for g in range(eff_group)],
                axis=0)
            k_h = kv_buf[slot, :bs, h * hd:(h + 1) * hd]  # (bs, hd) col slice
            v_h = kv_buf[slot, bs:, h * hd:(h + 1) * hd]
            if quantized:
                k_h = k_h.astype(jnp.bfloat16)
                v_h = v_h.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # (G*CQ, bs)
            if quantized:
                s = s * sc_buf[slot, h:h + 1, :]              # (1, bs) bcast
            s = jnp.where(live, s, NEG_INF)
            m_new = jnp.maximum(ms[t], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(live, p, 0.0)
            corr = jnp.exp(ms[t] - m_new)
            # l sums UNscaled probabilities; v-scale folds into p for the
            # V matmul only.
            ls2.append(ls[t] * corr + jnp.sum(p, axis=-1, keepdims=True))
            if quantized:
                p = p * sc_buf[slot, kvh + h:kvh + h + 1, :]
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (G*CQ, hd)
            ms2.append(m_new)
            accs2.append(accs[t] * corr + pv)
        return tuple(ms2), tuple(ls2), tuple(accs2)

    init = (tuple(jnp.full((gq, 1), NEG_INF, jnp.float32)
                  for _ in range(n_tiles)),
            tuple(jnp.zeros((gq, 1), jnp.float32) for _ in range(n_tiles)),
            tuple(jnp.zeros((gq, hd), jnp.float32) for _ in range(n_tiles)))
    ms, ls, accs = jax.lax.fori_loop(0, npages, body, init)

    # Assemble ONE full-lane (CQ, QH*hd) store: per-head stores into the
    # 3-D (cq, 1, hd) window are an "unsupported shape cast" in Mosaic for
    # hd % 128 != 0 (Qwen2-0.5B's hd=64); lane-concatenating the per-head
    # tiles and writing the flattened block is layout-clean for any hd.
    pieces = [None] * (n_tiles * eff_group)
    for t in range(n_tiles):
        h = t // (group // eff_group)
        g0 = (t % (group // eff_group)) * eff_group
        safe_l = jnp.where(ls[t] > 0.0, ls[t], 1.0)
        o = (accs[t] / safe_l).astype(out_ref.dtype)      # (G*CQ, hd)
        for g in range(eff_group):
            pieces[h * group + g0 + g] = o[g * cq:(g + 1) * cq]
    out_ref[...] = jnp.concatenate(pieces, axis=1)


@functools.lru_cache(maxsize=64)
def _build_kernel(T, QH, hd, bs, kvh, group, cq, dtype, scale, quantized,
                  interpret):
    C = T // cq
    in_specs = [
        pl.BlockSpec((cq, QH, hd), lambda i, *_: (i, 0, 0),
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
        out_specs=pl.BlockSpec((cq, QH * hd), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_prefill_kernel, cq=cq, bs=bs, kvh=kvh, group=group,
                          hd=hd, scale=scale, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, QH * hd), dtype),
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
    args = [layer, chunk_seg, chunk_pos, block_tables, context_lens,
            q.astype(out_dtype), cache.kv]
    if cache.quantized:
        args.append(cache.scale)
    return kernel(*args).reshape(T, QH, hd).astype(q.dtype)
