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


def _pick_k_tile(K: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of K up to `cap` — Mosaic requires the
    lane-dim block be a 128 multiple OR the whole axis, and the K axis
    cannot be cdiv-padded (out-of-bounds reads would pollute the
    accumulation). Whole-axis fallback covers K with no 128-multiple
    divisor. (A prior 8-aligned version picked 448 for Qwen2's K=896,
    which Mosaic refuses to lower.)"""
    for bk in range(min(cap, K) // 128 * 128, 0, -128):
        if K % bk == 0:
            return bk
    if K % 8 == 0 and K <= 4096:
        return K
    return 0


def _pick_k_tile_int8(K: int, T: int, bn: int) -> int:
    """int8 K tile: the WHOLE axis when the tiles fit VMEM — decode-size
    matmuls are per-call-overhead-bound, and one sequential K step with
    maximal weight DMAs measured 30% faster than bk=128/512 chains at
    Qwen2 geometry (round-4 bench_qmm: 3.84 -> 2.68 ms for the 24-layer
    4-matmul chain). Falls back to the tiled pick when whole-K would not
    fit the ~12 MiB scoped VMEM budget."""
    import os

    if K % 8 == 0 and os.environ.get("NANOVLLM_QMM_WHOLE_K") != "0":
        vmem = 2 * (K * bn) + T * K * 2 + T * bn * 4 + T * bn * 2
        if vmem <= 12 * 2**20:
            return K
    return _pick_k_tile(K)


@functools.lru_cache(maxsize=128)
def _build(T, K, N, bk, bn, x_dtype, out_dtype, interpret):
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        # cdiv: N need not divide bn — pallas pads the trailing block's
        # reads (garbage columns only feed out columns that get clipped on
        # write). Without this, vocab-sized N (151936 = 512*296 + 384)
        # fell to 128-wide tiles and the lm_head matmul ran ~4x its
        # HBM floor.
        grid=(pl.cdiv(N, bn), n_k),
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


def _qmm4_kernel(xlo_ref, xhi_ref, w_ref, s_ref, out_ref, acc_ref,
                 *, n_k: int, g: int, n_groups: int, asym: bool = False):
    """Packed-int4 matmul tile: w_ref (bk, bn) bytes hold logical input rows
    [k*bk, (k+1)*bk) in the LOW nibbles (matching xlo) and rows
    [K/2 + k*bk, ...) in the HIGH nibbles (matching xhi). s_ref carries ALL
    per-group scale rows for this n-tile (a handful of rows — blocking them
    would violate the 8-sublane rule), sliced dynamically: lo rows use
    group k*gpb + gi, hi rows group n_groups/2 + k*gpb + gi. Asymmetric
    packs (unsigned nibbles, dequant q*s + m) carry the per-group minima as
    n_groups extra rows below the scales."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.int32)
    if asym:
        u = w & 0xFF                                    # unsigned byte
        lo = (u & 0xF).astype(jnp.float32)
        hi = ((u >> 4) & 0xF).astype(jnp.float32)
    else:
        lo = ((w << 28) >> 28).astype(jnp.float32)      # sign-extended nibble
        hi = ((w << 24) >> 28).astype(jnp.float32)
    bk = w.shape[0]
    gpb = max(bk // g, 1)
    for gi in range(gpb):
        rows = slice(gi * g, (gi + 1) * g)
        slo = s_ref[pl.ds(k * gpb + gi, 1), :]
        shi = s_ref[pl.ds(n_groups // 2 + k * gpb + gi, 1), :]
        wl = lo[rows] * slo
        wh = hi[rows] * shi
        if asym:
            wl += s_ref[pl.ds(n_groups + k * gpb + gi, 1), :]
            wh += s_ref[pl.ds(n_groups + n_groups // 2 + k * gpb + gi, 1), :]
        acc_ref[...] += jax.lax.dot(
            xlo_ref[:, rows], wl.astype(xlo_ref.dtype),
            preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot(
            xhi_ref[:, rows], wh.astype(xhi_ref.dtype),
            preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.lru_cache(maxsize=128)
def _build4(T, K2, N, G, bk, bn, g, x_dtype, interpret, asym=False):
    n_k = K2 // bk
    rows = 2 * G if asym else G   # asym: [scales | minima]
    return pl.pallas_call(
        functools.partial(_qmm4_kernel, n_k=n_k, g=g, n_groups=G, asym=asym),
        grid=(pl.cdiv(N, bn), n_k),  # trailing N block clipped on write
        in_specs=[
            pl.BlockSpec((T, bk), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, bk), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), x_dtype),
        scratch_shapes=[pltpu.VMEM((T, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=128)
def _build_stacked(L, T, K, N, bk, bn, x_dtype, out_dtype, interpret):
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_qmm_stacked_kernel, n_k=n_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # layer index
            grid=(pl.cdiv(N, bn), n_k),
            in_specs=[
                pl.BlockSpec((T, bk), lambda n, k, l: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, bn), lambda n, k, l: (l[0], k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda n, k, l: (l[0], 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, bn), lambda n, k, l: (0, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((T, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )


def _qmm_stacked_kernel(layer_ref, x_ref, w_ref, s_ref, out_ref, acc_ref,
                        *, n_k: int):
    del layer_ref  # consumed by the index maps
    _qmm_kernel(x_ref, w_ref.at[0], s_ref.at[0], out_ref, acc_ref, n_k=n_k)


def int8_matmul_stacked(x, w, scale, layer, *, interpret: bool = False):
    """y = x @ dequant(w[layer]): w (L, K, N) int8 LAYER-STACKED, scale
    (L, N) f32, layer a traced scalar. The layer index rides the kernel's
    BlockSpec index_map (scalar prefetch), so NO per-layer weight slice is
    ever materialized — the XLA dynamic-slice copies fed ~0.7 ms/step of
    pure weight-copy traffic into the decode scan (round-3 trace)."""
    T, K = x.shape
    L, _, N = w.shape
    bn = 512 if N >= 512 else _pick_tile(N, (256, 128))
    bk = _pick_k_tile_int8(K, T, bn) if bn else 0
    if not bk or not bn or T % 8:
        wl = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        sl = jax.lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
        y = jnp.dot(x, wl.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * sl).astype(x.dtype)
    kernel = _build_stacked(L, T, K, N, bk, bn, jnp.dtype(x.dtype).name,
                            jnp.dtype(x.dtype).name, interpret)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    return kernel(layer, x, w, scale.reshape(L, 1, N))


def int4_matmul(x, w, scale, *, interpret: bool = False):
    """y = x @ dequant(w): w (K/2, N) packed int4, scale (K/g, N) f32
    symmetric or (2, K/g, N) asymmetric (plane 1 = per-group minima).

    Grid (N/bn, K2/bk): each w tile unpacks both nibble halves in VMEM and
    contracts them against the matching x column blocks (the halves map to
    logical rows [k*bk,(k+1)*bk) and [K/2 + k*bk, ...)). Falls back to the
    XLA unpack path when the shapes don't tile."""
    T, K = x.shape
    K2, N = w.shape
    assert K == 2 * K2, (K, K2)
    asym = scale.ndim == 3
    G = scale.shape[-2]          # number of groups over K
    g = K // G
    srows = 2 * G if asym else G
    bk = _pick_k_tile(K2)
    bn = 512 if N >= 512 else _pick_tile(N, (256, 128))
    # VMEM budget: two x blocks + w + scales are double-buffered by the grid
    # pipeline; the f32 accumulator and the out block are resident. Shrink
    # tiles until the estimate fits the ~16M scoped limit with headroom.
    def vmem(bk_, bn_):
        return (2 * (2 * T * bk_ * x.dtype.itemsize + bk_ * bn_
                     + srows * bn_ * 4)
                + T * bn_ * 4 + T * bn_ * x.dtype.itemsize)

    while bk and bn and vmem(bk, bn) > 12 * 2**20:
        if bk >= bn and bk > 128 and (bk // 2) % max(g, 1) == 0:
            bk //= 2
        elif bn > 128:
            bn //= 2
        else:
            break
    ok = (bk and bn and T % 8 == 0 and g <= bk and bk % g == 0
          and (K // 2) % g == 0 and vmem(bk, bn) <= 14 * 2**20
          and (bk % 128 == 0 or bk == K2))
    if not ok:
        from nanovllm_tpu.ops.quant import unpack_int4

        wf = unpack_int4(w, scale)
        return jnp.dot(x, wf.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    kernel = _build4(T, K2, N, G, bk, bn, g, jnp.dtype(x.dtype).name,
                     interpret, asym)
    # x split into the lo/hi column halves matching the nibble packing;
    # asym scales flatten to (2G, N) rows [scales | minima] (free reshape).
    return kernel(x[:, : K // 2], x[:, K // 2:], w,
                  scale.reshape(srows, N))


def _qmm4_stacked_kernel(layer_ref, xlo_ref, xhi_ref, w_ref, s_ref, out_ref,
                         acc_ref, *, n_k: int, g: int, n_groups: int,
                         asym: bool = False):
    del layer_ref
    _qmm4_kernel(xlo_ref, xhi_ref, w_ref.at[0], s_ref.at[0], out_ref,
                 acc_ref, n_k=n_k, g=g, n_groups=n_groups, asym=asym)


@functools.lru_cache(maxsize=128)
def _build4_stacked(L, T, K2, N, G, bk, bn, g, x_dtype, interpret,
                    asym=False):
    n_k = K2 // bk
    rows = 2 * G if asym else G   # asym: [scales | minima]
    return pl.pallas_call(
        functools.partial(_qmm4_stacked_kernel, n_k=n_k, g=g, n_groups=G,
                          asym=asym),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pl.cdiv(N, bn), n_k),
            in_specs=[
                pl.BlockSpec((T, bk), lambda n, k, l: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, bk), lambda n, k, l: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, bn), lambda n, k, l: (l[0], k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, bn), lambda n, k, l: (l[0], 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, bn), lambda n, k, l: (0, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((T, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, N), x_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )


def int4_matmul_stacked(x, w, scale, layer, *, interpret: bool = False):
    """Layer-stacked packed-int4 matmul: w (L, K/2, N), scale (L, K/g, N)
    symmetric or (L, 2, K/g, N) asymmetric, layer a traced scalar riding
    the index maps (no per-layer slice)."""
    T, K = x.shape
    L, K2, N = w.shape
    assert K == 2 * K2, (K, K2)
    asym = scale.ndim == 4
    G = scale.shape[-2]
    g = K // G
    srows = 2 * G if asym else G
    bk = _pick_k_tile(K2)
    bn = 512 if N >= 512 else _pick_tile(N, (256, 128))

    def vmem(bk_, bn_):
        return (2 * (2 * T * bk_ * x.dtype.itemsize + bk_ * bn_
                     + srows * bn_ * 4)
                + T * bn_ * 4 + T * bn_ * x.dtype.itemsize)

    while bk and bn and vmem(bk, bn) > 12 * 2**20:
        if bk >= bn and bk > 128 and (bk // 2) % max(g, 1) == 0:
            bk //= 2
        elif bn > 128:
            bn //= 2
        else:
            break
    ok = (bk and bn and T % 8 == 0 and g <= bk and bk % g == 0
          and (K // 2) % g == 0 and vmem(bk, bn) <= 14 * 2**20
          and (bk % 128 == 0 or bk == K2))
    if not ok:
        from nanovllm_tpu.ops.quant import unpack_int4

        wl = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        sl = jax.lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
        wf = unpack_int4(wl, sl)
        return jnp.dot(x, wf.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    kernel = _build4_stacked(L, T, K2, N, G, bk, bn, g,
                             jnp.dtype(x.dtype).name, interpret, asym)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    return kernel(layer, x[:, : K // 2], x[:, K // 2:], w,
                  scale.reshape(L, srows, N))


def _fused_mlp_kernel(layer_ref, x_ref, wg_ref, wu_ref, sg_ref, su_ref,
                      wd_ref, sd_ref, out_ref, acc_ref, *, n_i: int):
    """One SwiGLU MLP chunk: a = silu(x@wg*sg) * (x@wu*su); acc += a @ wd.
    The (T, 2I) gate_up intermediate never exists — each I-chunk's
    activation lives only in VMEM between its two MXU dots."""
    del layer_ref  # consumed by the index maps
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    g = jax.lax.dot(x, wg_ref[0].astype(x.dtype),
                    preferred_element_type=jnp.float32)
    g = g * sg_ref[0].astype(jnp.float32)
    u = jax.lax.dot(x, wu_ref[0].astype(x.dtype),
                    preferred_element_type=jnp.float32)
    u = u * su_ref[0].astype(jnp.float32)
    a = (g / (1.0 + jnp.exp(-g)) * u).astype(x.dtype)
    acc_ref[...] += jax.lax.dot(a, wd_ref[0].astype(x.dtype),
                                preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        out_ref[...] = (acc_ref[...] * sd_ref[0].astype(jnp.float32)
                        ).astype(out_ref.dtype)


@functools.lru_cache(maxsize=128)
def _build_fused_mlp(L, T, K, I, bt, bi, x_dtype, interpret):
    n_i = I // bi
    n_up = I // bi  # up columns start at block offset I/bi inside wgu
    return pl.pallas_call(
        functools.partial(_fused_mlp_kernel, n_i=n_i),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # layer index
            grid=(T // bt, n_i),
            in_specs=[
                pl.BlockSpec((bt, K), lambda t, i, l: (t, 0),
                             memory_space=pltpu.VMEM),
                # gate and up tiles are two windows of the SAME (L, K, 2I)
                # stack: columns [i*bi, ...) and [I + i*bi, ...).
                pl.BlockSpec((1, K, bi), lambda t, i, l: (l[0], 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, bi), lambda t, i, l: (l[0], 0, i + n_up),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bi), lambda t, i, l: (l[0], 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bi), lambda t, i, l: (l[0], 0, i + n_up),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bi, K), lambda t, i, l: (l[0], i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, K), lambda t, i, l: (l[0], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, K), lambda t, i, l: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bt, K), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, K), x_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )


def _fused_mlp_tiles(T: int, K: int, I: int):
    """(bt, bi) for the fused MLP, or (0, 0) when the shapes don't tile.
    bi must DIVIDE I (the I axis accumulates — cdiv padding would feed
    garbage gate/up columns into real wdown rows); bt must divide T."""
    bt = T if T <= 256 else _pick_tile(T, (256, 128))
    bi = 0
    for cand in range(min(I, 1024) // 128 * 128, 0, -128):
        if I % cand == 0:
            bi = cand
            break
    if not bt or not bi or T % 8 or K % 128:
        return 0, 0
    vmem = (bt * K * 2                      # x tile
            + 2 * 3 * (K * bi)              # wg/wu/wd, double-buffered
            + bt * K * 4 + bt * K * 2       # acc + out
            + 2 * bt * bi * 4)              # g/u intermediates
    while bi > 128 and vmem > 12 * 2**20:
        bi //= 2
        # Mosaic refuses lane-dim blocks that aren't 128-multiples (e.g.
        # 896 -> 448): fall back to the unfused chain rather than crash at
        # kernel lowering (same guard as the int4 paths' bk check).
        if I % bi or bi % 128:
            return 0, 0
        vmem = (bt * K * 2 + 2 * 3 * (K * bi) + bt * K * 6
                + 2 * bt * bi * 4)
    if vmem > 12 * 2**20:
        return 0, 0
    return bt, bi


def fused_mlp_int8_stacked(x, wgu, sgu, wdown, sdown, layer, *,
                           interpret: bool = False):
    """y = silu_and_mul(x @ deq(wgu[layer])) @ deq(wdown[layer]) in ONE
    kernel call. x (T, K) bf16; wgu (L, K, 2I) int8 with per-channel
    scales sgu (L, 2I); wdown (L, I, K) int8, sdown (L, K).

    Decode steps are per-call-overhead-bound (round-4 bench_qmm: the best
    24-layer x 4-matmul chain was ~4x its HBM floor); fusing the MLP's two
    matmuls and the silu kills one kernel launch, two elementwise passes
    and the (T, 2I) intermediate's HBM round trip per layer. Returns None
    when the geometry doesn't tile — caller falls back to the chain."""
    T, K = x.shape
    L, _, I2 = wgu.shape
    I = I2 // 2
    if wdown.shape != (L, I, K):
        return None
    bt, bi = _fused_mlp_tiles(T, K, I)
    if not bt:
        return None
    kernel = _build_fused_mlp(L, T, K, I, bt, bi, jnp.dtype(x.dtype).name,
                              interpret)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    sgu3 = sgu.reshape(L, 1, I2)
    return kernel(layer, x, wgu, wgu, sgu3, sgu3, wdown,
                  sdown.reshape(L, 1, K))


def int8_matmul(x, w, scale, *, interpret: bool = False):
    """y[t, n] = (sum_k x[t, k] * w[k, n]) * scale[n].

    x: (T, K) bf16/f32; w: (K, N) int8; scale: (N,) f32. Returns (T, N) in
    x.dtype. Falls back to the XLA dequant path when the shapes don't tile
    (callers treat that as best-effort)."""
    T, K = x.shape
    N = w.shape[1]
    # MXU-friendly tiles; K tile bigger than N tile so weight DMAs are
    # large. The N grid is cdiv so any N >= 512 gets full-width tiles.
    bn = 512 if N >= 512 else _pick_tile(N, (256, 128))
    bk = _pick_k_tile_int8(K, T, bn) if bn else 0
    if not bk or not bn or T % 8:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)
    kernel = _build(T, K, N, bk, bn, jnp.dtype(x.dtype).name,
                    jnp.dtype(x.dtype).name, interpret)
    return kernel(x, w, scale.reshape(1, N))
