"""Pallas TPU kernel: paged decode attention.

Replaces the reference's fused NPU op `npu_fused_infer_attention_score_v2`
on the decode path (reference nanovllm/layers/attention.py:63-93): one query
token per sequence slot, keys/values read page-by-page from the paged HBM
cache through the per-slot block table.

Why a kernel: the jnp fallback must gather every padded page column for every
slot, so it reads maxB/ceil(ctx/bs) times more HBM than needed. This kernel
walks exactly ceil(context/page) pages per sequence with double-buffered
DMA, which makes decode bandwidth-optimal — decode attention reads each live
KV byte exactly once.

Layout contract (matches the engine cache): caches are
(L, num_blocks, block_size, KVH, head_dim); the kernel receives the full
stack in HBM plus the layer index as a prefetched scalar, so no per-layer
slice is ever materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
N_BUF = 2  # double buffering


def _decode_kernel(layer_ref, tables_ref, ctx_ref,   # scalar prefetch (SMEM)
                   q_ref,                             # (1, QH, hd) VMEM
                   k_hbm, v_hbm,                      # (L, NB, bs, KVH, hd) HBM
                   out_ref,                           # (1, QH, hd) VMEM
                   k_buf, v_buf,                      # (N_BUF, bs, KVH, hd) VMEM
                   sems,                              # DMA sems (2, N_BUF)
                   *, bs: int, kvh: int, group: int, hd: int, scale: float):
    seq = pl.program_id(0)
    layer = layer_ref[0]
    ctx = ctx_ref[seq]
    npages = pl.cdiv(ctx, bs)

    def dma(buf, hbm, slot, j, row):
        page = tables_ref[seq, j]
        return pltpu.make_async_copy(hbm.at[layer, page], buf.at[slot],
                                     sems.at[row, slot])

    @pl.when(npages > 0)
    def _():
        dma(k_buf, k_hbm, 0, 0, 0).start()
        dma(v_buf, v_hbm, 0, 0, 1).start()

    q = q_ref[0].astype(jnp.float32).reshape(kvh, group, hd)

    def body(j, carry):
        m, l, acc = carry
        slot = j % N_BUF

        @pl.when(j + 1 < npages)
        def _():
            nxt = (j + 1) % N_BUF
            dma(k_buf, k_hbm, nxt, j + 1, 0).start()
            dma(v_buf, v_hbm, nxt, j + 1, 1).start()

        dma(k_buf, k_hbm, slot, j, 0).wait()
        dma(v_buf, v_hbm, slot, j, 1).wait()

        k = k_buf[slot].astype(jnp.float32)   # (bs, KVH, hd)
        v = v_buf[slot].astype(jnp.float32)
        # s[kvh, g, b] = sum_h q[kvh, g, h] * k[b, kvh, h]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (1,))),
            preferred_element_type=jnp.float32) * scale   # (KVH, G, bs)
        rem = ctx - j * bs
        live = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bs), 2) < rem
        s = jnp.where(live, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(live, p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        # acc[kvh, g, h] += sum_b p[kvh, g, b] * v[b, kvh, h]
        pv = jax.lax.dot_general(
            p, v, (((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.float32)           # (KVH, G, hd)
        acc = acc * corr[..., None] + pv
        return m_new, l, acc

    init = (jnp.full((kvh, group), NEG_INF, jnp.float32),
            jnp.zeros((kvh, group), jnp.float32),
            jnp.zeros((kvh, group, hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, npages, body, init)

    safe_l = jnp.where(l > 0.0, l, 1.0)
    out = (acc / safe_l[..., None]).reshape(1, kvh * group, hd)
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(q, k_cache, v_cache, block_tables, context_lens,
                           layer, *, scale: float, interpret: bool = False):
    """q: (S, QH, hd); caches (L, NB, bs, KVH, hd); layer: () int32.
    Returns (S, QH, hd). Slots with context_len == 0 yield zeros."""
    S, QH, hd = q.shape
    _, _, bs, kvh, _ = k_cache.shape
    group = QH // kvh

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, QH, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, QH, hd), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, bs, kvh, hd), k_cache.dtype),
            pltpu.VMEM((N_BUF, bs, kvh, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, N_BUF)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_decode_kernel, bs=bs, kvh=kvh, group=group, hd=hd,
                          scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, QH, hd), q.dtype),
        interpret=interpret,
    )
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    return kernel(layer, block_tables, context_lens, q, k_cache, v_cache)
