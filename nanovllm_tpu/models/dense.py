"""Generic dense decoder-only transformer, functional style.

One parameterized core serves the whole dense model zoo — the spec flags
cover the differences the reference implements as separate model files:
  * Qwen3 / Qwen2 / Qwen2.5 (reference nanovllm/models/qwen3.py:40-218):
    fused QKV, optional per-head q/k RMSNorm, optional QKV bias, SwiGLU MLP,
    fused add-norm residuals, optional tied embeddings.
  * Llama-3.x (reference nanovllm/models/llama.py): attention/MLP bias knobs,
    llama3 rope rescaling.
  * MiniCPM4 (reference nanovllm/models/mini_cpm4.py:304-391): embedding
    scale, depth-scaled residuals, width-scaled logits, LongRoPE tables.

TPU-first structure: parameters are a pytree of *layer-stacked* arrays and
the decoder runs as one `lax.scan` over layers (one compiled body instead of
L inlined copies); the paged KV cache is a stacked (L, ...) pair threaded
through the scan carry and updated in place via donated buffers.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops import attention as attn_ops
from nanovllm_tpu.ops.activation import silu_and_mul
from nanovllm_tpu.ops.norms import add_rms_norm, rms_norm
from nanovllm_tpu.ops.quant import fused_mlp, quant_matmul
from nanovllm_tpu.ops.rope import apply_rope_gathered


@dataclass(frozen=True)
class DenseSpec:
    """Static (hashable) architecture description — safe as a jit constant."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = True
    qk_norm: bool = False          # Qwen3: per-head RMSNorm on q and k
    qkv_bias: bool = False         # Qwen2 / Llama attention_bias
    o_bias: bool = False
    mlp_bias: bool = False
    # MiniCPM4 scaling knobs (neutral values = ordinary model)
    emb_scale: float = 1.0         # scale_emb
    residual_scale: float = 1.0    # scale_depth / sqrt(num_layers)
    logit_scale: float = 1.0       # 1 / (hidden_size / dim_model_base)
    # rope scaling, flattened to a hashable tag; tables are built host-side
    rope_variant: str = "default"
    # When set (inside shard_map), row-parallel matmul outputs are psum-ed
    # over this mesh axis — the reference's per-layer HCCL all_reduce
    # (linear.py:152). The spec then describes the LOCAL shard (heads and
    # intermediate divided by tp; see parallel/tp.py local_spec).
    tp_axis: Optional[str] = None
    # False when the vocab does not divide tp: the lm_head stays replicated
    # and compute_logits skips the all_gather.
    lm_head_tp: bool = True

    @property
    def q_size(self) -> int:
        return self.num_q_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def qkv_size(self) -> int:
        return self.q_size + 2 * self.kv_size


def _split_qkv(qkv, spec: DenseSpec):
    q = qkv[..., : spec.q_size]
    k = qkv[..., spec.q_size: spec.q_size + spec.kv_size]
    v = qkv[..., spec.q_size + spec.kv_size:]
    return q, k, v


# Layer-stacked weights kept OUT of the scan xs: quant_matmul selects the
# layer inside its kernel index maps, so no per-layer slice of the (big)
# weight stacks is ever materialized (norms/biases are tiny and still
# scan). MoE expert stacks ride here too — scanning them sliced a 302 MB
# per-layer copy of the 30B model's experts out of lax.scan every layer.
BIG_WEIGHTS = ("wqkv", "wqkv_scale", "wo", "wo_scale",
               "wgu", "wgu_scale", "wdown", "wdown_scale",
               "w_gate_up", "w_gate_up_scale", "w_down", "w_down_scale")


def split_layer_params(layers: dict):
    big = {k: v for k, v in layers.items() if k in BIG_WEIGHTS}
    small = {k: v for k, v in layers.items() if k not in BIG_WEIGHTS}
    return big, small


def decoder_layer(spec: DenseSpec, big, lp, h, residual, cos, sin,
                  cache, layer_idx, meta: attn_ops.AttnMeta,
                  attn_fn, kv_mode: str = "scatter"):
    """One decoder layer. h/residual: (T, D). `cache` is the FULL stacked
    KVCache and `big` the FULL weight stacks; all reads/writes go through
    layer-indexed kernels/gathers so no per-layer slice is materialized."""
    T = h.shape[0]
    normed, residual = add_rms_norm(h, residual, lp["ln1"], spec.rms_norm_eps)

    qkv = quant_matmul(normed, big["wqkv"], big.get("wqkv_scale"),
                       layer=layer_idx)
    if spec.qkv_bias:
        qkv = qkv + lp["bqkv"]
    q, k, v = _split_qkv(qkv, spec)
    q = q.reshape(T, spec.num_q_heads, spec.head_dim)
    k = k.reshape(T, spec.num_kv_heads, spec.head_dim)
    v = v.reshape(T, spec.num_kv_heads, spec.head_dim)
    if spec.qk_norm:
        q = rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
    q = apply_rope_gathered(q, cos, sin)
    k = apply_rope_gathered(k, cos, sin)

    # The backend owns BOTH the KV write and the attention read — one
    # interface point so kernels can fuse the write (decode writes one row
    # per lane; a fused kernel does it with an in-kernel DMA instead of a
    # separate XLA scatter pass over the cache).
    o, cache = attn_fn(q, k, v, cache, meta, spec.head_dim ** -0.5,
                       layer_idx, kv_mode)
    o = quant_matmul(o.reshape(T, spec.q_size), big["wo"],
                     big.get("wo_scale"), layer=layer_idx)
    if spec.tp_axis:
        o = jax.lax.psum(o, spec.tp_axis)
    if spec.o_bias:
        o = o + lp["bo"]
    o = o * spec.residual_scale

    normed, residual = add_rms_norm(o, residual, lp["ln2"], spec.rms_norm_eps)
    mlp_out = None
    if not spec.mlp_bias:
        mlp_out = fused_mlp(normed, big["wgu"], big.get("wgu_scale"),
                            big["wdown"], big.get("wdown_scale"), layer_idx)
    if mlp_out is None:
        gu = quant_matmul(normed, big["wgu"], big.get("wgu_scale"),
                          layer=layer_idx)
        if spec.mlp_bias:
            gu = gu + lp["bgu"]
        mlp_out = quant_matmul(silu_and_mul(gu), big["wdown"],
                               big.get("wdown_scale"), layer=layer_idx)
    if spec.tp_axis:
        mlp_out = jax.lax.psum(mlp_out, spec.tp_axis)
    if spec.mlp_bias:
        mlp_out = mlp_out + lp["bdown"]
    mlp_out = mlp_out * spec.residual_scale
    return mlp_out, residual, cache


def forward(spec: DenseSpec, params, input_ids, meta: attn_ops.AttnMeta,
            cache: attn_ops.KVCache, attn_fn=None, kv_mode: str = "scatter"):
    """Run the decoder. input_ids: (T,). `cache` is the stacked KVCache,
    expected donated by the caller's jit. Returns (last_hidden (S, D),
    cache)."""
    if attn_fn is None:
        attn_fn = default_attn_fn
    h = embed_lookup(params, input_ids, spec.emb_scale)
    residual = jnp.zeros_like(h)
    # gather per-token rope rows once, outside the layer scan
    cos = params["rope_cos"][meta.positions]
    sin = params["rope_sin"][meta.positions]

    big, small = split_layer_params(params["layers"])

    def body(carry, xs):
        h, residual, cache = carry
        lp, idx = xs
        h, residual, cache = decoder_layer(
            spec, big, lp, h, residual, cos, sin, cache, idx, meta, attn_fn,
            kv_mode=kv_mode)
        return (h, residual, cache), None

    idxs = jnp.arange(spec.num_layers, dtype=jnp.int32)
    (h, residual, cache), _ = jax.lax.scan(
        body, (h, residual, cache), (small, idxs))

    final = h + residual
    # Only the last query token of each slot feeds the LM head.
    selected = final[meta.last_token_idx]  # (S, D)
    selected = rms_norm(selected, params["final_ln"], spec.rms_norm_eps)
    return selected, cache


def embed_lookup(params, input_ids, emb_scale: float = 1.0):
    """Token embedding gather; supports per-row int8 embeddings
    (embed_scale present — the direct-quantized init path for models whose
    bf16 embeddings would not fit)."""
    emb = params["embed"][input_ids]
    if "embed_scale" in params:
        emb = (emb.astype(jnp.float32)
               * params["embed_scale"][input_ids][:, None]
               ).astype(params["final_ln"].dtype)
    return emb * emb_scale if emb_scale != 1.0 else emb


def compute_logits(spec: DenseSpec, params, hidden):
    """hidden: (S, D) -> logits (S, V) float32. Under tensor parallelism the
    lm_head is vocab-sharded; local logits are all-gathered so every shard
    samples the identical token (the reference gathers to rank 0 instead,
    embed_head.py:61-66 — full replication keeps the step SPMD)."""
    logits = quant_matmul(hidden, params["lm_head"],
                          params.get("lm_head_scale"))
    if spec.tp_axis and spec.lm_head_tp:
        logits = jax.lax.all_gather(logits, spec.tp_axis, axis=1, tiled=True)
    return logits.astype(jnp.float32) * spec.logit_scale


def default_attn_fn(q, k, v, cache, meta, scale, layer=None,
                    kv_mode="scatter"):
    """Exact jnp reference path (CPU tests / small shapes): scatter the new
    K/V rows, then attend over the updated cache."""
    cache = attn_ops.write_kv_mode(cache, k, v, meta, layer, mode=kv_mode)
    out = attn_ops.ragged_attention_reference(q, cache, meta, scale,
                                              layer=layer)
    return out, cache


# ---------------------------------------------------------------------------
# Spec construction from HF configs
# ---------------------------------------------------------------------------

def spec_from_hf(cfg, max_model_len: Optional[int] = None) -> DenseSpec:
    """Map a transformers config (Qwen3/Qwen2/Llama/MiniCPM) to a DenseSpec."""
    arch = (getattr(cfg, "architectures", None) or [""])[0]
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    qk_norm = arch.startswith("Qwen3") or hasattr(cfg, "q_norm")
    qkv_bias = bool(getattr(cfg, "attention_bias", False))
    if arch.startswith("Qwen2"):
        qkv_bias = True  # Qwen2 always has qkv bias
    kw: dict = {}
    if arch.startswith("MiniCPM"):
        scale_depth = getattr(cfg, "scale_depth", 1.0)
        kw.update(
            emb_scale=float(getattr(cfg, "scale_emb", 1.0)),
            residual_scale=float(scale_depth) / (cfg.num_hidden_layers ** 0.5),
            logit_scale=1.0 / (cfg.hidden_size / getattr(cfg, "dim_model_base", cfg.hidden_size)),
        )
    rope_scaling = getattr(cfg, "rope_scaling", None)
    rope_variant = "default"
    if rope_scaling:
        rope_variant = rope_scaling.get("rope_type") or rope_scaling.get("type") or "default"
    return DenseSpec(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_q_heads=cfg.num_attention_heads,
        num_kv_heads=getattr(cfg, "num_key_value_heads", cfg.num_attention_heads),
        head_dim=head_dim,
        intermediate_size=cfg.intermediate_size,
        rms_norm_eps=getattr(cfg, "rms_norm_eps", 1e-6),
        rope_theta=float(getattr(cfg, "rope_theta", 10000.0)),
        max_position_embeddings=max_model_len or getattr(cfg, "max_position_embeddings", 4096),
        tie_word_embeddings=bool(getattr(cfg, "tie_word_embeddings", False)),
        qk_norm=qk_norm,
        qkv_bias=qkv_bias,
        rope_variant=rope_variant,
        **kw,
    )


def init_params(spec: DenseSpec, key, dtype=jnp.bfloat16, rope_scaling=None):
    """Random-init a full parameter pytree (benching / tests without weights)."""
    from nanovllm_tpu.ops.rope import rope_table

    k = jax.random.split(key, 8)
    D, L = spec.hidden_size, spec.num_layers
    scale = 0.02

    def rnd(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "ln1": jnp.ones((L, D), dtype),
        "ln2": jnp.ones((L, D), dtype),
        "wqkv": rnd(k[0], (L, D, spec.qkv_size)),
        "wo": rnd(k[1], (L, spec.q_size, D)),
        "wgu": rnd(k[2], (L, D, 2 * spec.intermediate_size)),
        "wdown": rnd(k[3], (L, spec.intermediate_size, D)),
    }
    if spec.qkv_bias:
        layers["bqkv"] = jnp.zeros((L, spec.qkv_size), dtype)
    if spec.qk_norm:
        layers["q_norm"] = jnp.ones((L, spec.head_dim), dtype)
        layers["k_norm"] = jnp.ones((L, spec.head_dim), dtype)
    embed = rnd(k[4], (spec.vocab_size, D))
    cos, sin = rope_table(spec.head_dim, spec.max_position_embeddings,
                          spec.rope_theta, rope_scaling)
    return {
        "embed": embed,
        "layers": layers,
        "final_ln": jnp.ones((D,), dtype),
        "lm_head": embed.T if spec.tie_word_embeddings else rnd(k[5], (D, spec.vocab_size)),
        "rope_cos": cos,
        "rope_sin": sin,
    }
