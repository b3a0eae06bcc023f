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

NEG_INF = -1e30
N_BUF = 2


def _prefill_kernel(layer_ref, chunk_seg_ref, chunk_pos_ref, tables_ref, ctx_ref,
                    q_ref,                    # (CQ, QH, hd) VMEM
                    k_hbm, v_hbm,             # (L, NB, bs, KVH*hd) HBM
                    out_ref,                  # (CQ, QH, hd) VMEM
                    k_buf, v_buf, sems,
                    *, cq: int, bs: int, kvh: int, group: int, hd: int,
                    scale: float):
    c = pl.program_id(0)
    layer = layer_ref[0]
    seq = chunk_seg_ref[c]
    pos0 = chunk_pos_ref[c]          # absolute position of the chunk's first token
    ctx = ctx_ref[seq]
    # Causal early exit: this chunk's last query is at pos0 + cq - 1.
    kv_needed = jnp.minimum(ctx, pos0 + cq)
    npages = pl.cdiv(kv_needed, bs)

    def dma(buf, hbm, slot, j, row):
        page = tables_ref[seq, j]
        return pltpu.make_async_copy(hbm.at[layer, page], buf.at[slot],
                                     sems.at[row, slot])

    @pl.when(npages > 0)
    def _():
        dma(k_buf, k_hbm, 0, 0, 0).start()
        dma(v_buf, v_hbm, 0, 0, 1).start()

    # Token r of the chunk sits at absolute position pos0 + r.
    row_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (cq, 1), 0)
    nq = kvh * group

    # Flash state per query head as separate loop-carried leaves (Mosaic
    # lowers neither scatter nor value-DUS); GQA batching is a static loop
    # of plain 2D (CQ, hd) x (hd, bs) dots.
    def body(j, carry):
        ms, ls, accs = carry
        slot = j % N_BUF

        @pl.when(j + 1 < npages)
        def _():
            nxt = (j + 1) % N_BUF
            dma(k_buf, k_hbm, nxt, j + 1, 0).start()
            dma(v_buf, v_hbm, nxt, j + 1, 1).start()

        dma(k_buf, k_hbm, slot, j, 0).wait()
        dma(v_buf, v_hbm, slot, j, 1).wait()

        kv_pos = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        live = (kv_pos <= row_pos) & (kv_pos < ctx)       # (CQ, bs)
        ms2, ls2, accs2 = [], [], []
        for i in range(nq):
            h = i // group
            q_i = q_ref[:, i, :]                          # (CQ, hd)
            k_h = k_buf[slot, :, h * hd:(h + 1) * hd]     # (bs, hd) column slice
            v_h = v_buf[slot, :, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q_i, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # (CQ, bs)
            s = jnp.where(live, s, NEG_INF)
            m_new = jnp.maximum(ms[i], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(live, p, 0.0)
            corr = jnp.exp(ms[i] - m_new)
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (CQ, hd)
            ms2.append(m_new)
            ls2.append(ls[i] * corr + jnp.sum(p, axis=-1, keepdims=True))
            accs2.append(accs[i] * corr + pv)
        return tuple(ms2), tuple(ls2), tuple(accs2)

    init = (tuple(jnp.full((cq, 1), NEG_INF, jnp.float32) for _ in range(nq)),
            tuple(jnp.zeros((cq, 1), jnp.float32) for _ in range(nq)),
            tuple(jnp.zeros((cq, hd), jnp.float32) for _ in range(nq)))
    ms, ls, accs = jax.lax.fori_loop(0, npages, body, init)

    for i in range(nq):
        safe_l = jnp.where(ls[i] > 0.0, ls[i], 1.0)
        out_ref[:, i, :] = (accs[i] / safe_l).astype(out_ref.dtype)


@functools.lru_cache(maxsize=64)
def _build_kernel(T, QH, hd, bs, kvh, group, cq, dtype, scale, interpret):
    C = T // cq
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((cq, QH, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((cq, QH, hd), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, bs, kvh * hd), dtype),
            pltpu.VMEM((N_BUF, bs, kvh * hd), dtype),
            pltpu.SemaphoreType.DMA((2, N_BUF)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_prefill_kernel, cq=cq, bs=bs, kvh=kvh, group=group,
                          hd=hd, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, QH, hd), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )


def ragged_prefill_attention(q, k_cache, v_cache, chunk_seg, chunk_pos,
                             block_tables, context_lens, layer,
                             *, cq: int, scale: float, interpret: bool = False):
    """q: (T, QH, hd), T == C * cq; chunk_seg/chunk_pos: (C,).
    Returns (T, QH, hd). The pallas_call is memoized on shapes (one Mosaic
    lowering per shape, shared across layers and steps)."""
    T, QH, hd = q.shape
    _, _, bs, row = k_cache.shape
    kvh = row // hd
    group = QH // kvh
    kernel = _build_kernel(T, QH, hd, bs, kvh, group, cq,
                           jnp.dtype(q.dtype), float(scale), interpret)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    return kernel(layer, chunk_seg, chunk_pos, block_tables, context_lens,
                  q, k_cache, v_cache)
