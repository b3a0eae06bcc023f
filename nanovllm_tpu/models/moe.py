"""Qwen3-MoE: sparse mixture-of-experts decoder, functional style.

Parity target: reference nanovllm/models/qwen3_moe.py — routing semantics
(softmax -> top-k -> optional renormalize, qwen3_moe.py:151-161) and the
dense-attention skeleton. The reference dispatches with a *sequential python
loop over hit experts* (qwen3_moe.py:163-186), which its own graph mode
cannot even trace (README.md:17); here dispatch is sort-by-expert +
`jax.lax.ragged_dot` (XLA's grouped matmul, MXU-tiled), fully jittable.

Expert parallelism: expert-stacked weights shard on the expert axis; each
shard runs ragged_dot with `group_offset` over its local expert range and
contributions combine with a psum — expert parallelism without an
all-to-all (activations replicated, the right trade at inference batch
sizes on ICI).

Dense/sparse layer interleaves (`mlp_only_layers`, `decoder_sparse_step` —
reference qwen3_moe.py:208-218) keep the single homogeneous lax.scan via an
exact algebraic identity: a dense SwiGLU MLP of width I_dense decomposes
into m = I_dense / I_moe independent SwiGLU "experts" whose outputs sum —
silu(x G) * (x U) @ W = sum_j (silu(x G_j) * (x U_j)) @ W_j for column
chunks G_j/U_j and row chunks W_j. A dense layer is therefore stored as m
chunk-experts in the same (E, D, 2I) stack and routed with a FIXED uniform
assignment (weight 1 each), selected per layer by an `is_sparse` flag in
the scanned params — no second code path, no wasted weight memory.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.models import dense
from nanovllm_tpu.ops import attention as attn_ops
from nanovllm_tpu.ops.activation import silu_and_mul
from nanovllm_tpu.ops.norms import add_rms_norm, rms_norm
from nanovllm_tpu.ops.quant import quant_matmul
from nanovllm_tpu.ops.rope import apply_rope_gathered


@dataclass(frozen=True)
class MoESpec:
    base: dense.DenseSpec          # attention/backbone geometry
    num_experts: int = 128
    top_k: int = 8
    moe_intermediate_size: int = 768
    norm_topk_prob: bool = True
    # dense/sparse interleave (reference qwen3_moe.py:208-218): layer i is
    # sparse iff i not in mlp_only_layers and (i+1) % decoder_sparse_step == 0
    mlp_only_layers: tuple = ()
    decoder_sparse_step: int = 1
    # expert-parallel mesh axis (set inside shard_map); base.tp_axis may be
    # set independently for the attention/dense parts
    ep_axis: Optional[str] = None
    ep_offset: int = 0             # first expert owned by this shard
    num_local_experts: int = -1    # experts per shard (-1 = all)

    @property
    def local_experts(self) -> int:
        return self.num_local_experts if self.num_local_experts > 0 \
            else self.num_experts

    @property
    def sparse_mask(self) -> tuple:
        return tuple(
            i not in self.mlp_only_layers and self.num_experts > 0
            and (i + 1) % self.decoder_sparse_step == 0
            for i in range(self.base.num_layers))

    @property
    def uniform_sparse(self) -> bool:
        return all(self.sparse_mask)

    @property
    def dense_chunks(self) -> int:
        """Chunk-experts a dense (mlp-only) layer decomposes into."""
        return self.base.intermediate_size // self.moe_intermediate_size

    @property
    def route_k(self) -> int:
        """Static routing width: top_k, widened so a dense layer's fixed
        uniform assignment fits."""
        return self.top_k if self.uniform_sparse \
            else max(self.top_k, self.dense_chunks)


def _expert_weights(big, layer_idx):
    """Per-layer expert stacks from the layer-stacked big dict (XLA paths:
    a dynamic-slice copy; the pallas kernel indexes the stack in its DMA
    maps instead and never materializes this)."""
    out = {}
    for name in ("w_gate_up", "w_gate_up_scale", "w_down", "w_down_scale"):
        if name in big:
            out[name] = jax.lax.dynamic_index_in_dim(
                big[name], layer_idx, 0, keepdims=False)
    return out


def _pallas_mlp_ok(spec: MoESpec, big) -> bool:
    import jax as _jax

    b = spec.base
    return ("w_gate_up_scale" in big
            and spec.ep_axis is None and spec.num_local_experts <= 0
            and _jax.default_backend() == "tpu"
            and b.hidden_size % 256 == 0
            and spec.moe_intermediate_size % 256 == 0)


def moe_block(spec: MoESpec, big, lp, x, layer_idx):
    """Sparse MLP. x: (T, D) -> (T, D).

    lp: router (D, E_global); expert stacks ride in `big` (layer-stacked,
    selected by layer_idx)."""
    T, D = x.shape
    K = spec.route_k
    logits = (x @ lp["router"]).astype(jnp.float32)      # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    weights, idx = jax.lax.top_k(probs, spec.top_k)      # (T, top_k)
    if spec.norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    if K > spec.top_k:                                   # widen for interleave
        pad = K - spec.top_k
        weights = jnp.concatenate(
            [weights, jnp.zeros((T, pad), weights.dtype)], axis=1)
        idx = jnp.concatenate([idx, jnp.zeros((T, pad), idx.dtype)], axis=1)
    if not spec.uniform_sparse:
        # Dense (mlp-only) layers: fixed uniform routing to the m
        # chunk-experts that exactly reconstruct the dense SwiGLU MLP.
        m = spec.dense_chunks
        cols = jnp.arange(K, dtype=idx.dtype)
        idx_d = jnp.broadcast_to(jnp.where(cols < m, cols, 0), (T, K))
        w_d = jnp.broadcast_to((cols < m).astype(weights.dtype), (T, K))
        sparse = lp["is_sparse"] > 0
        idx = jnp.where(sparse, idx, idx_d)
        weights = jnp.where(sparse, weights, w_d)

    flat_expert = idx.reshape(-1)                        # (T*K,)
    order = jnp.argsort(flat_expert)
    token_of = order // K
    x_sorted = x[token_of]                               # (T*K, D)
    counts = jnp.zeros((spec.num_experts,), jnp.int32) \
        .at[flat_expert].add(1)                          # (E,)

    sharded = spec.ep_axis is not None or spec.num_local_experts > 0

    def local_gs(start, n_experts):
        """Group sizes seen by a matmul over experts [start, start+n_experts):
        pad with two absorber groups backed by zero experts, so rows routed
        outside the range multiply into zeros (this jax version's ragged_dot
        does not support a traced group_offset)."""
        cum = jnp.cumsum(counts)
        before = jnp.where(start > 0, cum[start - 1], 0)
        inside = cum[start + n_experts - 1] - before
        after = flat_expert.shape[0] - before - inside
        local = jax.lax.dynamic_slice(counts, (start,), (n_experts,))
        return jnp.concatenate([before[None], local, after[None]]).astype(jnp.int32)

    def pad_experts(w):
        zero = jnp.zeros((1,) + w.shape[1:], w.dtype)
        return jnp.concatenate([zero, w, zero], axis=0)

    if spec.ep_axis is not None:
        base = jax.lax.axis_index(spec.ep_axis) * spec.local_experts
    elif spec.num_local_experts > 0:
        base = jnp.asarray(spec.ep_offset, jnp.int32)
    else:
        base = jnp.asarray(0, jnp.int32)

    def expert_mlp(start, n_experts, w_gu, w_dn, absorb):
        """SwiGLU through experts [start, start+n_experts); rows routed
        elsewhere come out zero (absorber groups / zero weights)."""
        gs = local_gs(start, n_experts) if absorb \
            else counts
        if absorb:
            w_gu, w_dn = pad_experts(w_gu), pad_experts(w_dn)
        h = jax.lax.ragged_dot(x_sorted, w_gu, gs,
                               preferred_element_type=jnp.float32)
        h = silu_and_mul(h.astype(x.dtype))
        return jax.lax.ragged_dot(h, w_dn, gs,
                                  preferred_element_type=jnp.float32)

    if "w_gate_up_scale" in big and _pallas_mlp_ok(spec, big):
        # INT4 experts, fused path: the grouped int4 SwiGLU kernel streams
        # each hit expert's PACKED bytes once (biased-nibble masks + s8
        # MXU dots) — the XLA chunked-dequant alternative materializes
        # bf16 weights through HBM (3x traffic; 527 ms/step on the 30B).
        from nanovllm_tpu.ops.pallas.moe_int4 import RB, int4_grouped_mlp

        E = spec.num_experts
        RK = flat_expert.shape[0]
        aligned = -(-counts // 8) * 8
        cum_p = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned, dtype=jnp.int32)])
        cum = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
        pad_off = cum_p[:-1] - cum[:-1]
        positions = jnp.arange(RK, dtype=jnp.int32) \
            + pad_off[flat_expert[order]]
        # allocation: worst-case 7 pad rows per expert + RB rows of read
        # slack (the kernel reads whole RB blocks past short tails)
        R_alloc = RK + 7 * E + RB
        amax = jnp.max(jnp.abs(x_sorted.astype(jnp.float32)), axis=1,
                       keepdims=True)
        sx = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x_sorted.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        x8 = jnp.zeros((R_alloc, D), jnp.int8).at[positions].set(xq)
        xs = jnp.ones((R_alloc, 128), jnp.float32).at[positions].set(
            jnp.broadcast_to(sx, (RK, 128)))
        y_pad = int4_grouped_mlp(
            x8, xs, cum_p, big["w_gate_up"], big["w_gate_up_scale"],
            big["w_down"], big["w_down_scale"], layer_idx)
        y = y_pad[positions].astype(jnp.float32)
    elif "w_gate_up_scale" in big:
        # INT4 experts, XLA fallback (CPU / EP-sharded): weights stay
        # PACKED in HBM; dequantize CHUNK_E experts at a time and
        # accumulate the ragged products — a row outside the chunk hits
        # absorber/zero groups in BOTH stages, so summing chunks gives
        # every row exactly its own expert's output.
        from nanovllm_tpu.ops.quant import unpack_int4_biased

        lw = _expert_weights(big, layer_idx)
        e_local = spec.local_experts
        # Chunk size bounded by transient-dequant memory (~96 MB of bf16
        # expert weights live at once) — a 30B-class layer's full dequant
        # would be ~1.2 GB, blowing the tail of a 16 GB chip.
        per_expert = 2 * (lw["w_gate_up"].shape[1] * lw["w_gate_up"].shape[2]
                          + lw["w_down"].shape[1] * lw["w_down"].shape[2])
        ec = next(c for c in (32, 16, 8, 4, 2, 1)
                  if e_local % c == 0 and c * per_expert * 2 <= 96 * 2**20)

        def chunk(c, acc):
            def dq(name):
                w, s = lw[name], lw[name + "_scale"]
                q = jax.lax.dynamic_slice(
                    w, (c * ec, 0, 0), (ec,) + w.shape[1:])
                sc = jax.lax.dynamic_slice(
                    s, (c * ec, 0, 0), (ec,) + s.shape[1:])
                return unpack_int4_biased(q, sc).astype(x.dtype)

            return acc + expert_mlp(base + c * ec, ec,
                                    dq("w_gate_up"), dq("w_down"), True)

        y = jax.lax.fori_loop(
            0, e_local // ec, chunk,
            jnp.zeros((x_sorted.shape[0], D), jnp.float32))
    elif sharded:
        lw = _expert_weights(big, layer_idx)
        y = expert_mlp(base, spec.local_experts,
                       lw["w_gate_up"], lw["w_down"], True)
    else:
        lw = _expert_weights(big, layer_idx)
        y = expert_mlp(base, spec.num_experts,
                       lw["w_gate_up"], lw["w_down"], False)

    w_sorted = weights.reshape(-1)[order].astype(jnp.float32)
    out = jnp.zeros((T, D), jnp.float32).at[token_of].add(y * w_sorted[:, None])
    if spec.ep_axis is not None:
        out = jax.lax.psum(out, spec.ep_axis)
    return out.astype(x.dtype)


def decoder_layer(spec: MoESpec, big, lp, h, residual, cos, sin, cache,
                  layer_idx, meta, attn_fn, kv_mode: str = "scatter"):
    b = spec.base
    T = h.shape[0]
    normed, residual = add_rms_norm(h, residual, lp["ln1"], b.rms_norm_eps)
    qkv = quant_matmul(normed, big["wqkv"], big.get("wqkv_scale"),
                       layer=layer_idx)
    q, k, v = dense._split_qkv(qkv, b)
    q = q.reshape(T, b.num_q_heads, b.head_dim)
    k = k.reshape(T, b.num_kv_heads, b.head_dim)
    v = v.reshape(T, b.num_kv_heads, b.head_dim)
    if b.qk_norm:
        q = rms_norm(q, lp["q_norm"], b.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], b.rms_norm_eps)
    q = apply_rope_gathered(q, cos, sin)
    k = apply_rope_gathered(k, cos, sin)
    o, cache = attn_fn(q, k, v, cache, meta, b.head_dim ** -0.5,
                       layer_idx, kv_mode)
    o = quant_matmul(o.reshape(T, b.q_size), big["wo"], big.get("wo_scale"),
                     layer=layer_idx)
    if b.tp_axis:
        o = jax.lax.psum(o, b.tp_axis)

    normed, residual = add_rms_norm(o, residual, lp["ln2"], b.rms_norm_eps)
    mlp_out = moe_block(spec, big, lp, normed, layer_idx)
    return mlp_out, residual, cache


def forward(spec: MoESpec, params, input_ids, meta, cache, attn_fn=None,
            kv_mode: str = "scatter"):
    if attn_fn is None:
        attn_fn = dense.default_attn_fn
    b = spec.base
    h = dense.embed_lookup(params, input_ids)
    residual = jnp.zeros_like(h)
    cos = params["rope_cos"][meta.positions]
    sin = params["rope_sin"][meta.positions]

    big, small = dense.split_layer_params(params["layers"])

    def body(carry, xs):
        h, residual, cache = carry
        lp, idx = xs
        h, residual, cache = decoder_layer(
            spec, big, lp, h, residual, cos, sin, cache, idx, meta, attn_fn,
            kv_mode=kv_mode)
        return (h, residual, cache), None

    idxs = jnp.arange(b.num_layers, dtype=jnp.int32)
    (h, residual, cache), _ = jax.lax.scan(
        body, (h, residual, cache), (small, idxs))
    final = h + residual
    selected = final[meta.last_token_idx]
    selected = rms_norm(selected, params["final_ln"], b.rms_norm_eps)
    return selected, cache


def compute_logits(spec: MoESpec, params, hidden):
    return dense.compute_logits(spec.base, params, hidden)


def spec_from_hf(cfg, max_model_len=None) -> MoESpec:
    base = dense.spec_from_hf(cfg, max_model_len=max_model_len)
    spec = MoESpec(
        base=base,
        num_experts=cfg.num_experts,
        top_k=cfg.num_experts_per_tok,
        moe_intermediate_size=cfg.moe_intermediate_size,
        norm_topk_prob=bool(getattr(cfg, "norm_topk_prob", False)),
        mlp_only_layers=tuple(getattr(cfg, "mlp_only_layers", []) or []),
        decoder_sparse_step=int(getattr(cfg, "decoder_sparse_step", 1)),
    )
    if not spec.uniform_sparse:
        if base.intermediate_size % spec.moe_intermediate_size:
            raise NotImplementedError(
                "mlp_only interleave needs intermediate_size divisible by "
                "moe_intermediate_size for the chunk-expert decomposition")
        if spec.dense_chunks > spec.num_experts:
            raise NotImplementedError(
                "dense MLP wider than the whole expert stack")
    return spec


def init_params_quantized(spec: MoESpec, dtype=jnp.bfloat16,
                          rope_scaling=None, group: int = 128,
                          seed: int = 0):
    """Random-weight init that creates int4 tensors DIRECTLY (no bf16
    staging): a 30B-class MoE is ~15 GB packed int4 but ~60 GB bf16, which
    cannot even be staged on a 16 GB chip. Values are random bytes
    (nibbles) with constant-magnitude scales — numerically meaningless,
    identical compute/memory profile, which is what benching random-weight
    models measures. Embeddings are per-row int8 (+ embed_scale); the int4
    packed weights carry group scales exactly like ops/quant packs them.

    Memory budget (v5e 15.75 GiB visible): the expert stacks alone are
    14.5 GiB packed, so the EXPERT scales use the biased PLANE pack
    (2 groups, bf16) — f32 group-128 scales cost 0.9 GiB and OOMed the
    first real 30B run. Dense/lm_head scales stay at `group` (they feed
    the stacked int4 matmul kernel, which needs g <= bk)."""
    from nanovllm_tpu.ops.rope import rope_table

    rng = np.random.default_rng(seed)
    b = spec.base
    D, L, E, I = b.hidden_size, b.num_layers, spec.num_experts, \
        spec.moe_intermediate_size

    def pack4(*shape, g=group, scale_dtype=np.float32):
        K, N = shape[-2:]
        # both nibble halves must contain whole groups: (K/2) % g == 0
        while (K // 2) % g:
            if K // 2 <= g:
                g = K // 2
                break
            g //= 2
        packed = rng.integers(-128, 128, size=(*shape[:-2], K // 2, N),
                              dtype=np.int8)
        scale = rng.uniform(0.005, 0.02,
                            size=(*shape[:-2], K // g, N)).astype(np.float32)
        return jnp.asarray(packed), jnp.asarray(scale).astype(scale_dtype)

    layers = {
        "ln1": jnp.ones((L, D), dtype),
        "ln2": jnp.ones((L, D), dtype),
        "router": jnp.asarray(
            rng.normal(0, 0.02, (L, D, E)).astype(np.float32), dtype),
    }
    for name, shape in (("wqkv", (L, D, b.qkv_size)),
                        ("wo", (L, b.q_size, D))):
        layers[name], layers[name + "_scale"] = pack4(*shape)
    for name, shape in (("w_gate_up", (L, E, D, 2 * I)),
                        ("w_down", (L, E, I, D))):
        # Experts use the BIASED plane-scale pack (the grouped int4 MLP
        # kernel's format, ops/pallas/moe_int4.py): scales (..., 2, N)
        # = [s_lo, s_hi/16], random bytes are valid packed values.
        K, N = shape[-2:]
        layers[name] = jnp.asarray(rng.integers(
            -128, 128, size=(*shape[:-2], K // 2, N), dtype=np.int8))
        layers[name + "_scale"] = jnp.asarray(rng.uniform(
            0.005, 0.02, size=(*shape[:-2], 2, N)).astype(np.float32)
        ).astype(jnp.bfloat16)
    if not spec.uniform_sparse:
        layers["is_sparse"] = jnp.asarray(spec.sparse_mask, jnp.float32)
    if b.qk_norm:
        layers["q_norm"] = jnp.ones((L, b.head_dim), dtype)
        layers["k_norm"] = jnp.ones((L, b.head_dim), dtype)
    lm_head, lm_scale = pack4(D, b.vocab_size)
    cos, sin = rope_table(b.head_dim, b.max_position_embeddings, b.rope_theta,
                          rope_scaling)
    return {
        "embed": jnp.asarray(rng.integers(-128, 128, (b.vocab_size, D),
                                          dtype=np.int8)),
        "embed_scale": jnp.full((b.vocab_size,), 2e-4, jnp.float32),
        "layers": layers,
        "final_ln": jnp.ones((D,), dtype),
        "lm_head": lm_head,
        "lm_head_scale": lm_scale,
        "rope_cos": cos,
        "rope_sin": sin,
    }


def init_params(spec: MoESpec, key, dtype=jnp.bfloat16, rope_scaling=None):
    from nanovllm_tpu.ops.rope import rope_table

    b = spec.base
    ks = jax.random.split(key, 10)
    D, L, E, I = b.hidden_size, b.num_layers, spec.num_experts, \
        spec.moe_intermediate_size

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    layers = {
        "ln1": jnp.ones((L, D), dtype),
        "ln2": jnp.ones((L, D), dtype),
        "wqkv": rnd(ks[0], (L, D, b.qkv_size)),
        "wo": rnd(ks[1], (L, b.q_size, D)),
        "router": rnd(ks[2], (L, D, E)),
        "w_gate_up": rnd(ks[3], (L, E, D, 2 * I)),
        "w_down": rnd(ks[4], (L, E, I, D)),
    }
    if not spec.uniform_sparse:
        layers["is_sparse"] = jnp.asarray(spec.sparse_mask, jnp.float32)
    if b.qk_norm:
        layers["q_norm"] = jnp.ones((L, b.head_dim), dtype)
        layers["k_norm"] = jnp.ones((L, b.head_dim), dtype)
    embed = rnd(ks[5], (b.vocab_size, D))
    cos, sin = rope_table(b.head_dim, b.max_position_embeddings, b.rope_theta,
                          rope_scaling)
    return {
        "embed": embed,
        "layers": layers,
        "final_ln": jnp.ones((D,), dtype),
        "lm_head": embed.T if b.tie_word_embeddings else rnd(ks[6], (D, b.vocab_size)),
        "rope_cos": cos,
        "rope_sin": sin,
    }
