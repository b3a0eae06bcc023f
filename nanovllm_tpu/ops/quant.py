"""Weight-only INT8 / INT4 quantization.

The reference has no quantization at all; this implements the build-side
north-star features (BASELINE.json):
  * INT8: per-output-channel symmetric, dequant fused into the matmul
    epilogue (Pallas kernel on TPU) — weight HBM traffic halves vs bf16.
  * INT4: group-wise symmetric (group size 128 along the input axis, the
    GPTQ/AWQ convention — per-channel int4 is far too coarse), two values
    packed per int8 byte with the LOGICAL HALVES split (low nibble = input
    row k, high nibble = input row K/2 + k) so unpacking never interleaves
    rows — weight HBM traffic quarters.

Param convention: a quantized weight `w` (.., in, out) is accompanied by
`w_scale` in the same params dict — (.., out) f32 for int8;
(.., in/group, out) f32 for symmetric int4; (.., 2, in/group, out) f32 for
ASYMMETRIC int4 (plane 0 = scales, plane 1 = per-group minima; detected by
ndim, and the int4 value tensor has in/2 packed rows). Model code detects
quantization by the presence of the scale entry (a static pytree property).

Asymmetric int4 (round-4 BUILD_NOTES side experiment, implemented round 5):
dequant = q_u * scale + min with UNSIGNED nibbles q_u in [0, 15] — 16
levels spanning each group's actual range instead of 15 levels forced
symmetric around zero. Measured KL(bf16||int4) roughly halves; the cost is
one extra f32 row per group (+0.8% weight traffic at group 128).
"""

from __future__ import annotations

import jax.numpy as jnp

# weights quantized per layer-stack (name -> present in params["layers"])
LAYER_WEIGHTS = ("wqkv", "wo", "wgu", "wdown")

INT4_GROUP = 128


def quantize_weight_int4(w, group: int = INT4_GROUP, eps: float = 1e-8,
                         row_shards: int = 1):
    """w: (..., K, N) -> (packed int8 (..., K/2, N), scales (..., K/g, N)).

    Symmetric group-wise int4 in [-7, 7]; byte b at packed row k holds
    logical row k in its LOW nibble and logical row K/2 + k in its HIGH
    nibble (two's complement).

    row_shards > 1 (row-parallel weights under TP): each of the `row_shards`
    contiguous K-blocks is packed INDEPENDENTLY, so a PartitionSpec split of
    the packed rows into row_shards chunks hands every shard a
    self-contained pack (low/high nibbles both local) — this is what lets
    quantization="int4" compose with tensor_parallel_size > 1."""
    if row_shards > 1:
        K = w.shape[-2]
        assert K % row_shards == 0, (K, row_shards)
        Ks = K // row_shards
        blocked = w.reshape(*w.shape[:-2], row_shards, Ks, w.shape[-1])
        packed, scale = quantize_weight_int4(blocked, group, eps)
        packed = packed.reshape(*w.shape[:-2], K // 2, w.shape[-1])
        scale = scale.reshape(*w.shape[:-2], -1, w.shape[-1])
        return packed, scale
    wf = w.astype(jnp.float32)
    K = wf.shape[-2]
    assert K % 2 == 0, K
    while K % (2 * group):
        group //= 2  # tiny test models: shrink the group to fit
    assert group >= 1
    grouped = wf.reshape(*wf.shape[:-2], K // group, group, wf.shape[-1])
    amax = jnp.max(jnp.abs(grouped), axis=-2)
    scale = jnp.maximum(amax, eps) / 7.0                # (..., K/g, N)
    q = jnp.clip(jnp.round(grouped / scale[..., None, :]), -7, 7)
    q = q.reshape(wf.shape).astype(jnp.int8)            # (..., K, N)
    lo = q[..., : K // 2, :]
    hi = q[..., K // 2:, :]
    packed = (lo & 0x0F) | ((hi & 0x0F) << 4)
    return packed.astype(jnp.int8), scale


def quantize_weight_int4_asym(w, group: int = INT4_GROUP, eps: float = 1e-8,
                              row_shards: int = 1):
    """Asymmetric group-wise int4: w (..., K, N) -> (packed int8 (..., K/2,
    N), scale+min (..., 2, K/g, N)). dequant = q_u * scale + min, q_u the
    UNSIGNED nibble in [0, 15]. Same low/high logical-halves byte layout
    and row_shards contract as quantize_weight_int4."""
    if row_shards > 1:
        K = w.shape[-2]
        assert K % row_shards == 0, (K, row_shards)
        Ks = K // row_shards
        blocked = w.reshape(*w.shape[:-2], row_shards, Ks, w.shape[-1])
        packed, sm = quantize_weight_int4_asym(blocked, group, eps)
        packed = packed.reshape(*w.shape[:-2], K // 2, w.shape[-1])
        # (..., rs, 2, Ks/g, N) -> (..., 2, K/g, N) shard-major groups
        sm = jnp.swapaxes(sm, -4, -3).reshape(
            *w.shape[:-2], 2, -1, w.shape[-1])
        return packed, sm
    wf = w.astype(jnp.float32)
    K = wf.shape[-2]
    assert K % 2 == 0, K
    while K % (2 * group):
        group //= 2
    assert group >= 1
    grouped = wf.reshape(*wf.shape[:-2], K // group, group, wf.shape[-1])
    mx = jnp.max(grouped, axis=-2)
    mn = jnp.min(grouped, axis=-2)
    scale = jnp.maximum(mx - mn, eps) / 15.0             # (..., K/g, N)
    q = jnp.clip(jnp.round((grouped - mn[..., None, :])
                           / scale[..., None, :]), 0, 15)
    q = q.reshape(wf.shape).astype(jnp.int32)            # (..., K, N)
    lo = q[..., : K // 2, :]
    hi = q[..., K // 2:, :]
    packed = (lo | (hi << 4)).astype(jnp.int8)           # bit-truncating cast
    return packed, jnp.stack([scale, mn], axis=-3)       # (..., 2, K/g, N)


def unpack_int4(packed, scale, row_shards: int = 1):
    """Inverse of quantize_weight_int4 / quantize_weight_int4_asym ->
    float32 (..., K, N); asymmetric packs are detected by the scale rank
    (extra leading size-2 scale/min axis) and the group size is derived
    from the shapes (K / num_groups). Pass the same row_shards the pack was
    built with (each shard block unpacks independently); a shard's LOCAL
    slice is always row_shards=1."""
    asym = scale.ndim == packed.ndim + 1
    if row_shards > 1:
        Kp, N = packed.shape[-2:]
        pb = packed.reshape(*packed.shape[:-2], row_shards,
                            Kp // row_shards, N)
        if asym:
            sb = scale.reshape(*scale.shape[:-3], 2, row_shards,
                               scale.shape[-2] // row_shards, N)
            sb = jnp.swapaxes(sb, -4, -3)   # (..., rs, 2, Ks/g, N)
        else:
            sb = scale.reshape(*scale.shape[:-2], row_shards,
                               scale.shape[-2] // row_shards, N)
        return unpack_int4(pb, sb).reshape(*packed.shape[:-2], 2 * Kp, N)
    p = packed.astype(jnp.int32)
    if asym:
        u = p & 0xFF                                     # unsigned byte
        lo = u & 0xF
        hi = (u >> 4) & 0xF
    else:
        lo = (p << 28) >> 28                             # sign-extend nibble
        hi = (p << 24) >> 28
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    K = q.shape[-2]
    group = K // scale.shape[-2]
    grouped = q.reshape(*q.shape[:-2], K // group, group, q.shape[-1])
    if asym:
        s = scale[..., 0, :, :]
        m = scale[..., 1, :, :]
        deq = grouped * s[..., None, :] + m[..., None, :]
        return deq.reshape(q.shape)
    return (grouped * scale[..., None, :]).reshape(q.shape)


def quantize_int4_biased(w, eps: float = 1e-8):
    """BIASED nibble pack for the grouped int4 MLP kernel
    (ops/pallas/moe_int4.py): w (..., K, N) -> packed (..., K/2, N) int8 +
    scales (..., 2, N) f32.

    byte = (q_lo + 8) | (q_hi << 4): `b & 0x0F` yields q_lo + 8 and
    `b & 0xF0` yields 16 * q_hi — int8 AND is the only bitwise op Mosaic
    legalizes on int8 vectors, so extraction needs no shifts and no dtype
    conversion. Scale groups ARE the nibble planes (group = K/2): row
    plane [0, K/2) uses scales[0]; [K/2, K) uses scales[1], which is
    stored PRE-DIVIDED by 16 so the masked-byte dot needs no shift."""
    wf = w.astype(jnp.float32)
    K = wf.shape[-2]
    assert K % 2 == 0, K
    lo, hi = wf[..., : K // 2, :], wf[..., K // 2:, :]

    def q(plane):
        s = jnp.maximum(jnp.max(jnp.abs(plane), axis=-2), eps) / 7.0
        return jnp.clip(jnp.round(plane / s[..., None, :]), -8, 7), s

    q_lo, s_lo = q(lo)
    q_hi, s_hi = q(hi)
    packed = (q_lo.astype(jnp.int32) + 8
              + 16 * q_hi.astype(jnp.int32)).astype(jnp.int8)
    scales = jnp.stack([s_lo, s_hi / 16.0], axis=-2)      # (..., 2, N)
    return packed, scales


def unpack_int4_biased(packed, scales):
    """Inverse of quantize_int4_biased -> float32 (..., K, N)."""
    p = packed.astype(jnp.int32)
    q_lo = (p & 0xF) - 8
    q_hi = jnp.right_shift(p - (p & 0xF), 4)              # arithmetic
    s_lo = scales[..., 0:1, :].astype(jnp.float32)
    s_hi = scales[..., 1:2, :].astype(jnp.float32) * 16.0
    return jnp.concatenate([q_lo.astype(jnp.float32) * s_lo,
                            q_hi.astype(jnp.float32) * s_hi], axis=-2)


def quantize_weight(w, axis: int = -2, eps: float = 1e-8):
    """w: (..., in, out) -> (int8 values, per-out-channel scales f32)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(wf / jnp.expand_dims(scale, axis)), -127, 127)
    return q.astype(jnp.int8), scale


def quant_matmul(x, w, scale=None, layer=None):
    """y = x @ w with a fused dequant epilogue (int8 or packed int4).

    int4 is detected by the scale rank: per-group scales are (.., K/g, N)
    vs int8's per-channel (.., N). On TPU both paths are Pallas kernels
    that convert weight tiles in VMEM (ops/pallas/quant_matmul.py) —
    weight HBM traffic halves (int8) or quarters (int4). Elsewhere (CPU
    tests) they fall back to XLA dequant-then-dot, numerically identical.

    layer (traced scalar) + a LAYER-STACKED w selects the layer inside the
    kernel's index maps — no per-layer weight slice is materialized (the
    XLA dynamic-slice copies cost ~0.7 ms/step in the decode scan)."""
    import jax

    stacked = layer is not None
    if scale is None:
        if stacked:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        return x @ w

    int4 = scale.ndim >= w.ndim  # group axis present (+scale/min for asym)
    if jax.default_backend() == "tpu" and x.ndim == 2:
        from nanovllm_tpu.ops.pallas.quant_matmul import (
            int4_matmul, int4_matmul_stacked, int8_matmul,
            int8_matmul_stacked)

        if stacked:
            if int4:
                return int4_matmul_stacked(x, w, scale, layer)
            return int8_matmul_stacked(x, w, scale, layer)
        if int4:
            return int4_matmul(x, w, scale)
        return int8_matmul(x, w, scale)
    if stacked:
        w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        scale = jax.lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
    if int4:
        wf = unpack_int4(w, scale)
        return jnp.dot(x, wf.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def _fused_mlp_max_t() -> int:
    """Token-count gate for the fused MLP kernel (ADVICE round 4): its
    (T/bt, n_i) grid re-streams the whole wgu+wdown stacks T/bt times per
    layer, so it wins only where the step is call-overhead-bound (decode /
    small mixed steps) and loses to the stream-each-weight-once unfused
    chain at prefill sizes. 0 disables the kernel entirely (A/B switch)."""
    import os

    return int(os.environ.get("NANOVLLM_FUSED_MLP_MAX_T", 256))


def fused_mlp(x, wgu, sgu, wdown, sdown, layer):
    """silu_and_mul(x @ deq(wgu[layer])) @ deq(wdown[layer]) as ONE Pallas
    call when the int8 layer-stacked fast path applies; None otherwise
    (caller runs the unfused chain). See
    ops/pallas/quant_matmul.fused_mlp_int8_stacked."""
    import jax

    if (sgu is None or sdown is None
            or sgu.ndim != 2 or sdown.ndim != 2      # int8 per-channel only
            or jax.default_backend() != "tpu" or x.ndim != 2
            or x.shape[0] > _fused_mlp_max_t()):
        return None
    from nanovllm_tpu.ops.pallas.quant_matmul import fused_mlp_int8_stacked

    return fused_mlp_int8_stacked(x, wgu, sgu, wdown, sdown, layer)


# weights whose INPUT axis is split under row-parallel TP (their int4 packs
# must be per-shard self-contained, see quantize_weight_int4 row_shards)
ROW_PARALLEL_WEIGHTS = ("wo", "wdown")


def quantize_dense_params(params: dict, quantize_lm_head: bool = True,
                          bits: int = 8, row_shards: int = 1,
                          asym: bool = True) -> dict:
    """Quantize the big matmul weights of a dense params pytree in place
    (returns a new dict; embed and norms stay high-precision). bits: 8
    (per-channel) or 4 (group-wise, packed; `asym` selects the
    zero-point pack — KL roughly halves vs symmetric, tools/perplexity.py).
    row_shards: tensor-parallel degree — int4 row-parallel weights pack
    per shard block."""
    if bits == 8:
        qfn = quantize_weight
    else:
        qfn = quantize_weight_int4_asym if asym else quantize_weight_int4
    out = dict(params)
    layers = dict(params["layers"])
    for name in LAYER_WEIGHTS:
        if name in layers and layers[name].dtype != jnp.int8:
            kw = {}
            if bits == 4 and name in ROW_PARALLEL_WEIGHTS:
                kw["row_shards"] = row_shards
            q, s = qfn(layers[name], **kw)
            layers[name] = q
            layers[name + "_scale"] = s
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in out and out["lm_head"].dtype != jnp.int8:
        q, s = qfn(out["lm_head"])
        out["lm_head"] = q
        out["lm_head_scale"] = s
    return out


# MoE expert stacks (models/moe.py): contract axes are never TP-split
# (expert parallelism shards the EXPERT axis), so no row_shards needed.
EXPERT_WEIGHTS = ("w_gate_up", "w_down")


def quantize_params(params: dict, bits: int = 8, row_shards: int = 1,
                    asym: bool = True) -> dict:
    """Entry point used by the engine: dense weights always; MoE expert
    stacks additionally at int4 in the BIASED plane-scale pack (the
    grouped-MLP kernel's format — ops/pallas/moe_int4.py; the XLA
    fallback unpacks the same format). int8 experts are not implemented —
    they stay bf16."""
    out = quantize_dense_params(params, bits=bits, row_shards=row_shards,
                                asym=asym)
    if bits == 4:
        layers = dict(out["layers"])
        for name in EXPERT_WEIGHTS:
            if name in layers and layers[name].dtype != jnp.int8:
                q, s = quantize_int4_biased(layers[name])
                layers[name] = q
                layers[name + "_scale"] = s
        out["layers"] = layers
    return out
