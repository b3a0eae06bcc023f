"""Pallas TPU kernel: paged decode attention.

Replaces the reference's fused NPU op `npu_fused_infer_attention_score_v2`
on the decode path (reference nanovllm/layers/attention.py:63-93): one query
token per sequence slot, keys/values read page-by-page from the paged HBM
cache through the per-slot block table, with per-sequence early exit
(ceil(context/page) pages — the jnp fallback reads every padded column).

Performance shape (v3): decode attention compute is tiny next to its HBM
traffic, so the kernel keeps fixed per-op overheads off the DMA critical
path:
  * GQA heads fold into ONE matmul per page group via a block-diagonal
    query — q_bd (QH, KVH*hd) places head i's vector in its kv-head's column
    block, so q_bd @ K_page^T is exactly the grouped scores. q_bd is built
    (and the per-head output extracted) in the jitted CALLER: XLA fuses
    those relayouts far more cheaply than Mosaic executes them per program.
  * Pages stream PAGES_PER_ITER at a time with double-buffered DMA of whole
    flat (bs, KVH*hd) rows — few large copies instead of per-head slices.

Layout contract: caches are (L, num_blocks, block_size, KVH*head_dim) in
HBM (the engine's canonical shape); the kernel gets the full stack plus the
layer index as a prefetched scalar — no per-layer slice is materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
N_BUF = 2
PAGES_PER_ITER = 2


def _decode_kernel(layer_ref, tables_ref, ctx_ref,   # scalar prefetch (SMEM)
                   qbd_ref,                           # (1, QH, KVH*hd) VMEM
                   k_hbm, v_hbm,                      # (L, NB, bs, KVH*hd) HBM
                   out_ref,                           # (1, QH, KVH*hd) VMEM
                   k_buf, v_buf,                      # (N_BUF, P, bs, KVH*hd)
                   sems,                               # DMA sems (2, N_BUF, P)
                   *, bs: int, row_dim: int, scale: float):
    P = PAGES_PER_ITER
    seq = pl.program_id(0)
    layer = layer_ref[0]
    ctx = ctx_ref[seq]
    npages = pl.cdiv(ctx, bs)
    niters = pl.cdiv(npages, P)

    def page_dmas(it, slot, do_start):
        base = it * P
        for p in range(P):
            j = base + p

            @pl.when(j < npages)
            def _():
                page = tables_ref[seq, j]
                kc = pltpu.make_async_copy(k_hbm.at[layer, page],
                                           k_buf.at[slot, p],
                                           sems.at[0, slot, p])
                vc = pltpu.make_async_copy(v_hbm.at[layer, page],
                                           v_buf.at[slot, p],
                                           sems.at[1, slot, p])
                if do_start:
                    kc.start()
                    vc.start()
                else:
                    kc.wait()
                    vc.wait()

    @pl.when(niters > 0)
    def _():
        page_dmas(0, 0, True)

    q_bd = qbd_ref[0]                                  # (QH, KVH*hd)
    nq = q_bd.shape[0]
    rows = P * bs

    def body(it, carry):
        m, l, acc = carry
        slot = it % N_BUF

        @pl.when(it + 1 < niters)
        def _():
            page_dmas(it + 1, (it + 1) % N_BUF, True)

        page_dmas(it, slot, False)

        k_flat = k_buf[slot].reshape(rows, row_dim)
        v_flat = v_buf[slot].reshape(rows, row_dim)
        s = jax.lax.dot_general(
            q_bd, k_flat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (QH, P*bs)
        rem = ctx - it * rows
        live = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) < rem
        s = jnp.where(live, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p_ = jnp.exp(s - m_new)
        p_ = jnp.where(live, p_, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p_, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p_.astype(v_flat.dtype), v_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (QH, KVH*hd)
        acc = acc * corr + pv
        return m_new, l, acc

    init = (jnp.full((nq, 1), NEG_INF, jnp.float32),
            jnp.zeros((nq, 1), jnp.float32),
            jnp.zeros((nq, row_dim), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, niters, body, init)

    safe_l = jnp.where(l > 0.0, l, 1.0)
    out_ref[0] = (acc / safe_l).astype(out_ref.dtype)


@functools.lru_cache(maxsize=64)
def _build_kernel(S, QH, hd, bs, row_dim, maxB, dtype, scale, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, QH, row_dim), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, QH, row_dim), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, PAGES_PER_ITER, bs, row_dim), dtype),
            pltpu.VMEM((N_BUF, PAGES_PER_ITER, bs, row_dim), dtype),
            pltpu.SemaphoreType.DMA((2, N_BUF, PAGES_PER_ITER)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_decode_kernel, bs=bs, row_dim=row_dim, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, QH, row_dim), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )


def paged_decode_attention(q, k_cache, v_cache, block_tables, context_lens,
                           layer, *, scale: float, interpret: bool = False):
    """q: (S, QH, hd); caches (L, NB, bs, KVH*hd); layer: () int32.
    Returns (S, QH, hd). Slots with context_len == 0 yield zeros.

    The pallas_call object is memoized on shapes: one Mosaic lowering serves
    every layer of every step (a fresh partial() per call re-lowered the
    same kernel dozens of times and dominated compile time)."""
    S, QH, hd = q.shape
    L, NB, bs, row_dim = k_cache.shape
    kvh = row_dim // hd
    group = QH // kvh

    # Block-diagonal query, built under XLA: head i -> column block i//group.
    sel = (jnp.arange(QH) // group)[:, None] == jnp.arange(kvh)[None, :]
    q_bd = jnp.where(sel[:, :, None], q[:, :, None, :],
                     jnp.zeros((), q.dtype)).reshape(S, QH, row_dim)

    kernel = _build_kernel(S, QH, hd, bs, row_dim, block_tables.shape[1],
                           jnp.dtype(q.dtype), float(scale), interpret)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    out_flat = kernel(layer, block_tables, context_lens, q_bd,
                      k_cache, v_cache)
    # Head i's output lives in its kv-head's column block: static slices +
    # concat (a take_along_axis here lowers to a catastrophically slow
    # XLA gather).
    parts = [out_flat[:, h * group:(h + 1) * group, h * hd:(h + 1) * hd]
             for h in range(kvh)]
    return jnp.concatenate(parts, axis=1)