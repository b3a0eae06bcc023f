"""Qwen3-VL: ViT vision tower + DeepStack + mrope text decoder.

Parity target: reference nanovllm/models/qwen3_vl.py (Conv3d patch embed
:314-341, bilinear-interpolated learned pos-embed :540-598, 2D rotary
:497-538, per-image full-attention blocks :375-421, spatial patch merger
:424-444, DeepStack mergers tapping intermediate ViT layers :486-495 with
features *added* into the first N text layers at visual positions :223-241).

Beyond the reference: the text decoder implements Qwen3-VL's interleaved
MRoPE (3D t/h/w rotary positions) faithfully — the reference silently drops
`rope_scaling` and runs plain 1D rope (its qwen3_vl.py:153-155), which
diverges from the real checkpoint's semantics for image tokens. Validated
against HuggingFace transformers logits in tests/test_vl_parity.py.

Split of labor:
  * `encode_image` runs OUTSIDE the engine step as its own jit per image
    shape (vision cost is once per request; outputs are cached on the
    Sequence, reference model_runner.py:534-559).
  * `text_forward` is the engine's jitted step: dense backbone + per-token
    mrope cos/sin + vision-embedding splice + DeepStack adds, all driven by
    fixed-shape `extras` arrays prepared host-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.models import dense
from nanovllm_tpu.ops.norms import rms_norm
from nanovllm_tpu.ops.rope import apply_rope_gathered


@dataclass(frozen=True)
class VisionSpec:
    depth: int
    hidden_size: int
    intermediate_size: int
    num_heads: int
    in_channels: int
    patch_size: int
    temporal_patch_size: int
    spatial_merge_size: int
    out_hidden_size: int
    num_position_embeddings: int
    deepstack_indexes: tuple

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self):
        return self.spatial_merge_size ** 2


@dataclass(frozen=True)
class VLSpec:
    text: dense.DenseSpec
    vision: VisionSpec
    mrope_sections: tuple          # (t, h, w) channel counts
    mrope_interleaved: bool = True
    image_token_id: int = -1
    video_token_id: int = -1


# ---------------------------------------------------------------------------
# Vision tower (per image; static shapes per grid)
# ---------------------------------------------------------------------------

def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _vision_rope_tables(vspec: VisionSpec, grid, merge_grouped=True):
    """Host: per-token (h, w) rotary freq rows, merge-grouped order.
    Returns numpy (seq, head_dim // 2)."""
    t, h, w = grid
    m = vspec.spatial_merge_size
    dim = vspec.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))

    hm, wm = h // m, w // m
    rows = (np.arange(hm)[:, None, None, None] * m
            + np.arange(m)[None, None, :, None])
    cols = (np.arange(wm)[None, :, None, None] * m
            + np.arange(m)[None, None, None, :])
    rows = np.broadcast_to(rows, (hm, wm, m, m)).reshape(-1)
    cols = np.broadcast_to(cols, (hm, wm, m, m)).reshape(-1)
    coords = np.stack([rows, cols], -1)          # (h*w, 2)
    coords = np.tile(coords, (t, 1))
    freqs = coords[:, :, None] * inv[None, None, :]   # (seq, 2, dim/2)
    return freqs.reshape(coords.shape[0], -1)         # (seq, head_dim//2)


def _pos_embed_weights(vspec: VisionSpec, grid):
    """Host: bilinear interpolation indices/weights of the learned pos table
    (reference qwen3_vl.py:540-598 semantics), merge-group permuted."""
    t, h, w = grid
    side = int(vspec.num_position_embeddings ** 0.5)
    m = vspec.spatial_merge_size
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    hf_, wf_ = h_idx.astype(np.int64), w_idx.astype(np.int64)
    hc = np.clip(hf_ + 1, None, side - 1)
    wc = np.clip(wf_ + 1, None, side - 1)
    dh, dw = h_idx - hf_, w_idx - wf_

    idx = np.stack([
        (hf_[:, None] * side + wf_[None, :]).reshape(-1),
        (hf_[:, None] * side + wc[None, :]).reshape(-1),
        (hc[:, None] * side + wf_[None, :]).reshape(-1),
        (hc[:, None] * side + wc[None, :]).reshape(-1),
    ])
    wgt = np.stack([
        ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
        ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
        (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
        (dh[:, None] * dw[None, :]).reshape(-1),
    ])
    # merge-group permutation of the (h*w) axis, repeated over t
    perm = np.arange(h * w).reshape(h // m, m, w // m, m) \
        .transpose(0, 2, 1, 3).reshape(-1)
    return idx[:, perm], wgt[:, perm], perm


def encode_image(vspec: VisionSpec, vp, pixels, grid):
    """One image through the tower. pixels: (seq, C*Tp*P*P) float32 in the
    HF processor's patch order; grid = (t, h, w) python ints.
    Returns (merged (seq/m^2, out_hidden), deepstack (n_ds, seq/m^2, out_hidden))."""
    t, h, w = grid
    seq = t * h * w
    m2 = vspec.merge_unit

    x = pixels.astype(vp["patch_w"].dtype) @ vp["patch_w"] + vp["patch_b"]

    idx, wgt, _ = _pos_embed_weights(vspec, grid)
    pos = (vp["pos_embed"][jnp.asarray(idx)]
           * jnp.asarray(wgt, vp["pos_embed"].dtype)[:, :, None]).sum(0)
    pos = jnp.tile(pos, (t, 1))
    x = x + pos

    freqs = jnp.asarray(_vision_rope_tables(vspec, grid), jnp.float32)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)

    nh, hd = vspec.num_heads, vspec.head_dim
    ds_feats = []
    for i in range(vspec.depth):
        lp = jax.tree.map(lambda a: a[i], vp["blocks"])
        r = x
        y = _layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        qkv = y @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv.reshape(seq, 3, nh, hd), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]
        q = apply_rope_gathered(q, cos, sin)
        k = apply_rope_gathered(k, cos, sin)
        att = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                         k.astype(jnp.float32)) * (hd ** -0.5)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v.astype(jnp.float32))
        o = o.reshape(seq, nh * hd).astype(x.dtype) @ lp["proj_w"] + lp["proj_b"]
        x = r + o
        r = x
        y = _layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        y = jax.nn.gelu(y @ lp["fc1_w"] + lp["fc1_b"], approximate=True)
        x = r + (y @ lp["fc2_w"] + lp["fc2_b"])

        if i in vspec.deepstack_indexes:
            j = vspec.deepstack_indexes.index(i)
            mp = jax.tree.map(lambda a: a[j], vp["ds_mergers"])
            g = x.reshape(-1, vspec.hidden_size * m2)    # postshuffle first
            g = _layer_norm(g, mp["norm_w"], mp["norm_b"])
            g = jax.nn.gelu(g @ mp["fc1_w"] + mp["fc1_b"], approximate=False)
            ds_feats.append(g @ mp["fc2_w"] + mp["fc2_b"])

    mp = vp["merger"]
    g = _layer_norm(x, mp["norm_w"], mp["norm_b"])       # pre-shuffle norm
    g = g.reshape(-1, vspec.hidden_size * m2)
    g = jax.nn.gelu(g @ mp["fc1_w"] + mp["fc1_b"], approximate=False)
    merged = g @ mp["fc2_w"] + mp["fc2_b"]               # (seq/m2, out_hidden)
    return merged, jnp.stack(ds_feats) if ds_feats else \
        jnp.zeros((0,) + merged.shape, merged.dtype)


# ---------------------------------------------------------------------------
# MRoPE (text side)
# ---------------------------------------------------------------------------

def mrope_axis_map(spec: VLSpec) -> np.ndarray:
    """Channel -> coordinate axis (0=t, 1=h, 2=w) for head_dim//2 channels."""
    half = spec.text.head_dim // 2
    sect = spec.mrope_sections
    axis = np.zeros(half, np.int32)
    if spec.mrope_interleaved:
        axis[1: 3 * sect[1]: 3] = 1
        axis[2: 3 * sect[2]: 3] = 2
    else:
        axis[sect[0]: sect[0] + sect[1]] = 1
        axis[sect[0] + sect[1]: sect[0] + sect[1] + sect[2]] = 2
    return axis


def mrope_cos_sin(spec: VLSpec, params, pos3):
    """pos3: (3, T) -> per-token cos/sin (T, head_dim//2)."""
    cos3 = params["rope_cos"][pos3]        # (3, T, half)
    sin3 = params["rope_sin"][pos3]
    onehot = jax.nn.one_hot(jnp.asarray(mrope_axis_map(spec)), 3,
                            dtype=cos3.dtype)            # (half, 3)
    cos = jnp.einsum("ati,ia->ti", cos3, onehot)
    sin = jnp.einsum("ati,ia->ti", sin3, onehot)
    return cos, sin


def compute_mrope_positions(token_ids, placeholders, grids, merge,
                            start_val: int = 0):
    """Host: 3D rope positions for a prompt (HF get_rope_index semantics for
    images). placeholders: [(start, length)], grids: [(t, h, w)].
    Returns (pos3 (3, len) int32, next_val)."""
    n = len(token_ids)
    pos = np.zeros((3, n), np.int32)
    st = start_val
    cursor = 0
    for (p_start, p_len), (t, h, w) in zip(placeholders, grids):
        n_text = p_start - cursor
        if n_text:
            pos[:, cursor:p_start] = st + np.arange(n_text)
            st += n_text
        hm, wm = h // merge, w // merge
        t_idx = np.repeat(np.arange(t), hm * wm)
        h_idx = np.tile(np.repeat(np.arange(hm), wm), t)
        w_idx = np.tile(np.arange(wm), t * hm)
        pos[0, p_start:p_start + p_len] = st + t_idx
        pos[1, p_start:p_start + p_len] = st + h_idx
        pos[2, p_start:p_start + p_len] = st + w_idx
        st += int(max(t, hm, wm))
        cursor = p_start + p_len
    if cursor < n:
        pos[:, cursor:] = st + np.arange(n - cursor)
        st += n - cursor
    return pos, st


# ---------------------------------------------------------------------------
# Text decoder with splice + DeepStack
# ---------------------------------------------------------------------------

def text_forward(spec: VLSpec, params, input_ids, meta, cache, attn_fn=None,
                 extras=None, kv_mode: str = "scatter"):
    """extras: mm_embeds (T, D), visual_mask (T,) bool, deepstack
    (n_ds, T, D) already zero at text rows, mrope_pos (3, T)."""
    if attn_fn is None:
        attn_fn = dense.default_attn_fn
    ts = spec.text
    h = params["embed"][input_ids]
    if extras is not None:
        mask = extras["visual_mask"][:, None]
        h = jnp.where(mask, extras["mm_embeds"].astype(h.dtype), h)
        cos, sin = mrope_cos_sin(spec, params, extras["mrope_pos"])
        deepstack = extras["deepstack"].astype(h.dtype)
        n_ds = deepstack.shape[0]
    else:
        cos = params["rope_cos"][meta.positions]
        sin = params["rope_sin"][meta.positions]
        deepstack = None
        n_ds = 0
    residual = jnp.zeros_like(h)

    big, small = dense.split_layer_params(params["layers"])

    def body(carry, xs):
        h, residual, cache = carry
        lp, idx = xs
        h, residual, cache = dense.decoder_layer(
            ts, big, lp, h, residual, cos, sin, cache, idx, meta, attn_fn,
            kv_mode=kv_mode)
        if n_ds:
            ds = jax.lax.dynamic_index_in_dim(
                deepstack, jnp.minimum(idx, n_ds - 1), 0, keepdims=False)
            h = h + jnp.where(idx < n_ds, ds, jnp.zeros((), h.dtype))
        return (h, residual, cache), None

    idxs = jnp.arange(ts.num_layers, dtype=jnp.int32)
    (h, residual, cache), _ = jax.lax.scan(
        body, (h, residual, cache), (small, idxs))
    final = h + residual
    selected = final[meta.last_token_idx]
    selected = rms_norm(selected, params["final_ln"], ts.rms_norm_eps)
    return selected, cache


def spec_from_hf(cfg, max_model_len: Optional[int] = None) -> VLSpec:
    vc, tc = cfg.vision_config, cfg.text_config
    text = dense.spec_from_hf(tc, max_model_len=max_model_len)
    if not text.qk_norm:  # Qwen3VLText arch name may not start with "Qwen3"
        text = dense.DenseSpec(**{**text.__dict__, "qk_norm": True})
    rs = tc.rope_scaling or {}
    return VLSpec(
        text=text,
        vision=VisionSpec(
            depth=vc.depth, hidden_size=vc.hidden_size,
            intermediate_size=vc.intermediate_size, num_heads=vc.num_heads,
            in_channels=vc.in_channels, patch_size=vc.patch_size,
            temporal_patch_size=vc.temporal_patch_size,
            spatial_merge_size=vc.spatial_merge_size,
            out_hidden_size=vc.out_hidden_size,
            num_position_embeddings=vc.num_position_embeddings,
            deepstack_indexes=tuple(vc.deepstack_visual_indexes),
        ),
        mrope_sections=tuple(rs.get("mrope_section", [24, 20, 20])),
        mrope_interleaved=bool(rs.get("mrope_interleaved", True)),
        image_token_id=int(getattr(cfg, "image_token_id", -1)),
        video_token_id=int(getattr(cfg, "video_token_id", -1)),
    )
