"""RMS normalization, computed in fp32 regardless of input dtype.

Parity target: reference nanovllm/layers/layernorm.py:16-39 — including the
fused add+norm variant returning (normed, new_residual), the residual-threading
idiom every decoder layer uses. Plain jnp: XLA fuses these into neighbouring
matmuls, no kernel needed.
"""

import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def add_rms_norm(x, residual, weight, eps: float = 1e-6):
    """Returns (norm(x + residual), x + residual)."""
    new_residual = x + residual
    return rms_norm(new_residual, weight, eps), new_residual
