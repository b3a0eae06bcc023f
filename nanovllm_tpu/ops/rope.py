"""Rotary position embeddings (NeoX half-split layout) with precomputed
cos/sin tables, plus Llama-3 and LongRoPE frequency rescaling.

Parity targets: reference nanovllm/layers/rotary_embedding.py:6-69 (plain +
llama variants) and nanovllm/models/mini_cpm4.py:38-136 (LongRoPE short/long
factor tables). Tables are computed once on host at model build time and live
in the params pytree, so the jitted step just gathers rows by position.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def rope_table(head_dim: int, max_len: int, base: float = 10000.0,
               scaling: dict | None = None, dtype=jnp.float32):
    """Returns (cos, sin), each (max_len, head_dim // 2)."""
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, half, dtype=np.float64) / half))
    attn_factor = 1.0
    if scaling:
        rtype = scaling.get("rope_type") or scaling.get("type")
        if rtype == "llama3":
            inv_freq = _llama3_rescale(inv_freq, scaling)
        elif rtype == "longrope":
            # Caller selects short vs long factor table by max_len.
            factor = np.asarray(scaling["factor"], dtype=np.float64)
            inv_freq = inv_freq / factor
            attn_factor = scaling.get("attention_factor", 1.0)
        elif rtype == "linear":
            inv_freq = inv_freq / scaling["factor"]
        elif rtype in (None, "default"):
            pass
        else:
            raise NotImplementedError(f"rope scaling {rtype!r}")
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    cos = np.cos(freqs) * attn_factor
    sin = np.sin(freqs) * attn_factor
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def _llama3_rescale(inv_freq: np.ndarray, s: dict) -> np.ndarray:
    factor = s["factor"]
    low = s.get("low_freq_factor", 1.0)
    high = s.get("high_freq_factor", 4.0)
    orig = s.get("original_max_position_embeddings", 8192)
    wavelen = 2 * math.pi / inv_freq
    low_wavelen = orig / low
    high_wavelen = orig / high
    scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (orig / wavelen - low) / (high - low)
    blended = (1 - smooth) * inv_freq / factor + smooth * inv_freq
    is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(is_mid, blended, scaled)


def longrope_attn_factor(scaling: dict) -> float:
    """MiniCPM/Phi LongRoPE amplitude: log-based scaling factor
    (reference mini_cpm4.py:73-90 semantics)."""
    factor = scaling.get("attention_factor")
    if factor is not None:
        return factor
    scale = scaling.get("factor", 1.0)
    if scale <= 1.0:
        return 1.0
    orig = scaling["original_max_position_embeddings"]
    return math.sqrt(1 + math.log(scale) / math.log(orig))


def apply_rope(x, cos, sin, positions):
    """x: (..., T, heads, head_dim); cos/sin: (max_len, head_dim//2);
    positions: (T,) absolute positions. NeoX half-split rotation."""
    return apply_rope_gathered(x, cos[positions], sin[positions])


def apply_rope_gathered(x, cos, sin):
    """x: (T, heads, head_dim); cos/sin already gathered per token:
    (T, head_dim//2). NeoX half-split rotation."""
    c = cos[..., :, None, :]  # (T, 1, half)
    s = sin[..., :, None, :]
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out1 = x1 * c - x2 * s
    out2 = x2 * c + x1 * s
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
