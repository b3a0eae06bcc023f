"""Pallas TPU kernel: paged decode attention, grid-pipelined variant.

Instead of manual double-buffered DMA (decode_attention.py), this version
maps KV pages into the kernel through BlockSpec index_maps that read the
scalar-prefetched block table — so Mosaic's own grid pipeline does the
HBM->VMEM streaming with its (sub-microsecond) per-step overhead, replacing
~8us/iteration of hand-rolled DMA bookkeeping.

Grid: (S, ceil(pages_per_seq / P)). Each step fetches P pages per cache via
P independent block specs; page indices beyond a sequence's context clamp to
its last valid page (the duplicate columns are masked out, costing only the
padded fraction of bandwidth). Flash state lives in VMEM scratch that
persists across the page dimension; the output block is revisited and only
written back on the final step of each sequence.

Same math as decode_attention.py: block-diagonal queries in permuted
(tiled kv-head) row order, optional int8 KV with transposed per-token scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.attention import KVCache

NEG_INF = -1e30
P = 2  # pages fetched per grid step


def _kernel(layer_ref, tables_ref, ctx_ref,          # scalar prefetch
            qbd_ref,                                  # (1, QH, row) VMEM
            *refs,
            bs: int, row_dim: int, group: int, scale: float,
            quantized: bool, npage_steps: int):
    if quantized:
        kv_refs = refs[:P]
        sc_refs = refs[P: 2 * P]
        out_ref, m_ref, l_ref, acc_ref = refs[2 * P: 2 * P + 4]
    else:
        kv_refs = refs[:P]
        sc_refs = None
        out_ref, m_ref, l_ref, acc_ref = refs[P: P + 4]

    s_idx = pl.program_id(0)
    j = pl.program_id(1)
    ctx = ctx_ref[s_idx]

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Skip fully-padded steps (still fetched, but cheap to skip compute).
    @pl.when(j * P * bs < ctx)
    def _():
        q_bd = qbd_ref[0]                              # (QH, row)
        # Fused pages: block (1, 1, 2*bs, row) — K rows [:bs], V rows [bs:].
        k = jnp.concatenate([r[0, 0, :bs] for r in kv_refs], axis=0)  # (P*bs, row)
        v = jnp.concatenate([r[0, 0, bs:] for r in kv_refs], axis=0)
        if quantized:
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
        rows = P * bs
        s = jax.lax.dot_general(
            q_bd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # (QH, P*bs)
        if quantized:
            kvh = sc_refs[0].shape[-2] // 2
            ks = jnp.concatenate([r[0, 0, :kvh] for r in sc_refs], axis=1)
            vs = jnp.concatenate([r[0, 0, kvh:] for r in sc_refs], axis=1)
            s = s * pltpu.repeat(ks, group, axis=0)
        base = j * rows
        live = base + jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) < ctx
        s = jnp.where(live, s, NEG_INF)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p_ = jnp.exp(s - m_new)
        p_ = jnp.where(live, p_, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * corr + jnp.sum(p_, axis=-1, keepdims=True)
        if quantized:
            p_ = p_ * pltpu.repeat(vs, group, axis=0)
        pv = jax.lax.dot_general(
            p_.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (QH, row)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = m_new

    @pl.when(j == npage_steps - 1)
    def _():
        l = l_ref[...]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        out_ref[0] = (acc_ref[...] / safe_l).astype(out_ref.dtype)


@functools.lru_cache(maxsize=64)
def _build(S, QH, hd, bs, row_dim, group, maxB, dtype, scale, quantized,
           interpret):
    kvh = row_dim // hd
    npage_steps = -(-maxB // P)

    def page_idx(p):
        def idx(s, j, layer_ref, tables_ref, ctx_ref):
            last = jnp.maximum(pl.cdiv(ctx_ref[s], bs) - 1, 0)
            page = tables_ref[s, jnp.minimum(j * P + p, last)]
            return (layer_ref[0], page, 0, 0)

        return idx

    q_spec = pl.BlockSpec((1, QH, row_dim), lambda s, j, *_: (s, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_specs = [pl.BlockSpec((1, 1, 2 * bs, row_dim), page_idx(p),
                             memory_space=pltpu.VMEM) for p in range(P)]
    in_specs = [q_spec] + kv_specs
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, 2 * kvh, bs), page_idx(p),
                                  memory_space=pltpu.VMEM) for p in range(P)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, npage_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, QH, row_dim), lambda s, j, *_: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((QH, 1), jnp.float32),       # m
            pltpu.VMEM((QH, 1), jnp.float32),       # l
            pltpu.VMEM((QH, row_dim), jnp.float32),  # acc
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, bs=bs, row_dim=row_dim, group=group,
                          scale=scale, quantized=quantized,
                          npage_steps=npage_steps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, QH, row_dim), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )


def paged_decode_attention_v4(q, cache: KVCache, block_tables, context_lens,
                              layer, *, scale: float, interpret: bool = False):
    """Same contract as paged_decode_attention (grid-pipelined variant)."""
    S, QH, hd = q.shape
    L, NB, bs2, row_dim = cache.kv.shape
    bs = bs2 // 2
    kvh = row_dim // hd
    group = QH // kvh
    maxB = block_tables.shape[1]

    perm = [(r % kvh) * group + r // kvh for r in range(QH)]
    q_perm = q[:, jnp.asarray(perm), :]
    sel = (jnp.arange(QH) % kvh)[:, None] == jnp.arange(kvh)[None, :]
    q_bd = jnp.where(sel[:, :, None], q_perm[:, :, None, :],
                     jnp.zeros((), q.dtype)).reshape(S, QH, row_dim)
    out_dtype = jnp.dtype(jnp.bfloat16) if cache.quantized else jnp.dtype(q.dtype)

    kernel = _build(S, QH, hd, bs, row_dim, group, maxB, out_dtype,
                    float(scale), cache.quantized, interpret)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    # One operand per block spec: P views of each fused cache array.
    args = [layer, block_tables, context_lens, q_bd.astype(out_dtype)]
    args += [cache.kv] * P
    if cache.quantized:
        args += [cache.scale] * P
    out_flat = kernel(*args)
    parts = [out_flat[:, (i % group) * kvh + i // group, None,
                      (i // group) * hd:(i // group + 1) * hd]
             for i in range(QH)]
    return jnp.concatenate(parts, axis=1).astype(q.dtype)
