"""Pallas TPU kernel: weight-only INT8 matmul with in-kernel dequantization.

The round-1 `quant_matmul` did `x @ w.astype(bf16)` — XLA materializes the
bf16 weight copy in HBM (read int8 + write bf16 + read bf16 = 1.5x the
bf16-only traffic), making int8 weights a throughput REGRESSION
(BUILD_NOTES round-1: 1001 vs 1165 tok/s). Here the int8 weight tile is
DMA'd into VMEM by the grid pipeline, converted to bf16 in VMEM (no HBM
round-trip), and the per-output-channel scale is applied in the accumulator
epilogue — weight HBM traffic actually halves, which is the whole point of
weight-only quantization on a bandwidth-bound decode step.

Grid (N/bn, K/bk): N parallel, K sequential with an f32 VMEM accumulator
(weights are streamed tile-by-tile; x rows stay resident). Replaces the
reference's quant story (it has none — SURVEY §6 BASELINE.json names INT8
weights as a build-side extension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], w_ref[...].astype(x_ref.dtype),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)
                        ).astype(out_ref.dtype)


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


@functools.lru_cache(maxsize=128)
def _build(T, K, N, bk, bn, x_dtype, out_dtype, interpret):
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((T, bk), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((T, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )


def int8_matmul(x, w, scale, *, interpret: bool = False):
    """y[t, n] = (sum_k x[t, k] * w[k, n]) * scale[n].

    x: (T, K) bf16/f32; w: (K, N) int8; scale: (N,) f32. Returns (T, N) in
    x.dtype. Falls back to the XLA dequant path when the shapes don't tile
    (callers treat that as best-effort)."""
    T, K = x.shape
    N = w.shape[1]
    # MXU-friendly tiles; K tile bigger than N tile so weight DMAs are large.
    bk = _pick_tile(K, (512, 256, 128))
    bn = _pick_tile(N, (512, 256, 128))
    if not bk or not bn or T % 8:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)
    kernel = _build(T, K, N, bk, bn, jnp.dtype(x.dtype).name,
                    jnp.dtype(x.dtype).name, interpret)
    return kernel(x, w, scale.reshape(1, N))
