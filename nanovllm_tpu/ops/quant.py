"""Weight-only INT8 quantization.

The reference has no quantization at all; this implements the build-side
north-star feature (BASELINE.json): per-output-channel symmetric INT8 for
every large matmul weight, with dequantization fused into the matmul
epilogue — XLA reads the int8 weight from HBM, converts in VMEM, and applies
the channel scale to the product, so weight HBM traffic halves vs bf16.

Param convention: a quantized weight `w` (.., in, out) int8 is accompanied by
`w_scale` (.., out) float32 in the same params dict. Model code detects
quantization by the presence of the scale entry (a static pytree property).
"""

from __future__ import annotations

import jax.numpy as jnp

# weights quantized per layer-stack (name -> present in params["layers"])
LAYER_WEIGHTS = ("wqkv", "wo", "wgu", "wdown")


def quantize_weight(w, axis: int = -2, eps: float = 1e-8):
    """w: (..., in, out) -> (int8 values, per-out-channel scales f32)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(wf / jnp.expand_dims(scale, axis)), -127, 127)
    return q.astype(jnp.int8), scale


def quant_matmul(x, w, scale=None):
    """y = x @ w with a fused int8 dequant epilogue.

    On TPU the int8 path is a Pallas kernel that converts weight tiles
    int8->bf16 in VMEM (ops/pallas/quant_matmul.py) — the weight's HBM
    traffic actually halves. Elsewhere (CPU tests) it falls back to an XLA
    dequant-then-dot, which is numerically identical."""
    if scale is None:
        return x @ w
    import jax

    if jax.default_backend() == "tpu" and x.ndim == 2:
        from nanovllm_tpu.ops.pallas.quant_matmul import int8_matmul

        return int8_matmul(x, w, scale)
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def quantize_dense_params(params: dict, quantize_lm_head: bool = True) -> dict:
    """Quantize the big matmul weights of a dense params pytree in place
    (returns a new dict; embed and norms stay high-precision)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in LAYER_WEIGHTS:
        if name in layers and layers[name].dtype != jnp.int8:
            q, s = quantize_weight(layers[name])
            layers[name] = q
            layers[name + "_scale"] = s
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in out and out["lm_head"].dtype != jnp.int8:
        q, s = quantize_weight(out["lm_head"])
        out["lm_head"] = q
        out["lm_head_scale"] = s
    return out
