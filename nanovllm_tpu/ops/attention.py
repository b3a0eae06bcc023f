"""Paged KV-cache attention: metadata plumbing, cache writes, and the pure-jnp
reference backends. The Pallas kernels (ops/pallas/) plug into the same
interfaces; backend selection lives in `get_backend`.

Parity targets:
  * KV write      — reference torch_npu._npu_reshape_and_cache /
                    scatter_update_ (nanovllm/layers/attention.py:22-35)
  * varlen prefill— npu_fused_infer_attention_score_v2, TND layout
                    (nanovllm/layers/attention.py:49-59)
  * paged decode  — same op, BNSD layout over block tables
                    (nanovllm/layers/attention.py:63-93)
  * jnp reference — nanovllm/layers/attention_torch_native.py (the hardware-
                    free "textbook" backend used for tests)

Design differences from the reference (TPU-first):
  * ONE flattened varlen layout serves prefill and decode; decode is the
    T == num_slots special case. Queries always read K/V from the paged cache
    (so prefill computes only the uncached suffix — the reference recomputes
    whole prompts, nanovllm/engine/model_runner.py:238-290).
  * Cache layout is FUSED (layers, num_blocks, 2*block_size,
    kv_heads*head_dim) — a page's K rows and V rows are contiguous, so one
    DMA per page feeds the kernels and one scatter per step writes both
    planes; token slots stay flat contiguous rows (reshape-free at the jit
    boundary).
  * All batch metadata is fixed-shape, padded device arrays — one compiled
    step serves every cache state (the reference needed a separate
    "padding" prep path for graph mode, model_runner.py:292-342).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class KVCache(NamedTuple):
    """Paged KV cache pytree, FUSED layout: one value array
    (L, NB, 2*block_size, KVH*head_dim) holding a page's K rows at
    [..., page, :bs, :] and its V rows at [..., page, bs:, :] — a page's K
    and V are one contiguous HBM chunk, so the decode/prefill kernels fetch
    a whole page with a SINGLE DMA (the round-1 split-array layout needed
    2-4 copies per page and their issue overhead dominated the decode step,
    BUILD_NOTES round-1 measurements). The K/V planes are folded into the
    ROW axis rather than kept as a separate size-2 axis because XLA's
    scatter layout assignment places window dims minor: a size-2 second-
    minor axis gets tile-padded 2->4 (int8 T(4,128)) and the relayout copy
    DOUBLES the cache's HBM footprint — observed as a 20.4 GiB allocation
    for a 10.2 GiB logical cache. Quantized caches add fused scales
    (L, NB, 2*KVH, block_size) float32 (K-scale rows then V-scale rows) —
    also one DMA — stored transposed so kernels can apply a page's scales
    to score tiles without an in-kernel transpose. `scale` is None for
    non-quantized caches."""

    kv: jax.Array
    scale: jax.Array | None = None

    @property
    def quantized(self) -> bool:
        return self.scale is not None

    @property
    def block_size(self) -> int:
        return self.kv.shape[-2] // 2

    # Split views (tests / debug / host-side reads — these COPY; kernels
    # slice the fused buffers in VMEM instead).
    @property
    def k(self) -> jax.Array:
        return self.kv[..., : self.block_size, :]

    @property
    def v(self) -> jax.Array:
        return self.kv[..., self.block_size :, :]

    @property
    def k_scale(self):
        if self.scale is None:
            return None
        return self.scale[..., : self.scale.shape[-2] // 2, :]

    @property
    def v_scale(self):
        if self.scale is None:
            return None
        return self.scale[..., self.scale.shape[-2] // 2 :, :]

    @classmethod
    def build(cls, k, v, k_scale=None, v_scale=None) -> "KVCache":
        """Fuse separate K/V (.., NB, bs, KVH*hd) arrays (and optional
        (.., NB, KVH, bs) scales) into the single-DMA layout."""
        kv = jnp.concatenate([k, v], axis=-2)
        sc = None
        if k_scale is not None:
            sc = jnp.concatenate([k_scale, v_scale], axis=-2)
        return cls(kv, sc)

    @classmethod
    def zeros(cls, num_layers, num_blocks, block_size, kv_heads, head_dim,
              dtype=jnp.bfloat16, quantized=False) -> "KVCache":
        kv = jnp.zeros((num_layers, num_blocks, 2 * block_size,
                        kv_heads * head_dim),
                       jnp.int8 if quantized else dtype)
        sc = None
        if quantized:
            sc = jnp.zeros((num_layers, num_blocks, 2 * kv_heads, block_size),
                           jnp.float32)
        return cls(kv, sc)


def quantize_rows(x, eps: float = 1e-8):
    """x: (T, KVH, hd) -> (int8 values (T, KVH, hd), scales (T, KVH) f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


class AttnMeta(NamedTuple):
    """Per-step batch metadata. T = padded token count, S = padded seq slots.

    Prefill layouts are *chunk-aligned*: every sequence's query suffix starts
    at a multiple of the query-chunk size CQ, so T // CQ fixed-size chunks
    each belong to exactly one sequence (`chunk_seg`). This is both what the
    memory-safe jnp flash path scans over and the natural grid of the Pallas
    ragged-prefill kernel.

    Padding convention: unused token lanes have seg_id pointing at a slot with
    context_len == 0 and slot_mapping pointing at the reserved scratch page.
    """

    seg_ids: jax.Array       # (T,) int32: query token -> batch slot
    positions: jax.Array     # (T,) int32: absolute position of each query
    slot_mapping: jax.Array  # (T,) int32: flat cache slot (block*bs + off)
    block_tables: jax.Array  # (S, maxB) int32: physical page ids, 0-padded
    context_lens: jax.Array  # (S,) int32: kv length per slot incl. new tokens
    last_token_idx: jax.Array  # (S,) int32: index into T of each slot's last query
    chunk_seg: jax.Array     # (T // CQ,) int32: query chunk -> batch slot
    num_seqs: jax.Array      # () int32: live slots (for host-side truncation)
    # Mixed (chunked-prefill + decode) steps only: per-slot kv length for the
    # decode lane region, 0 for slots that are prefilling this step (so the
    # decode kernel early-exits on them). None outside mixed steps.
    decode_context_lens: jax.Array | None = None


def write_kv_mode(cache: KVCache, k, v, meta: "AttnMeta", layer,
                  mode: str = "scatter") -> KVCache:
    """Static-phase dispatch for the KV write (mode is trace-time):
      "scatter" — general per-row scatter (works for any slot pattern);
      "unique"  — pure decode: one distinct page per live lane, single-pass
                  scale update;
      "chunks"  — pure prefill in the chunk-aligned layout: DUS per chunk;
      "mixed"   — [prefill region | decode rows]: chunks + unique."""
    if mode == "chunks":
        chunk = k.shape[0] // meta.chunk_seg.shape[0]
        return write_kv_chunks(cache, k, v, meta.slot_mapping, chunk, layer)
    if mode == "mixed":
        S = meta.context_lens.shape[0]
        Tp = k.shape[0] - S
        chunk = Tp // meta.chunk_seg.shape[0]
        cache = write_kv_chunks(cache, k[:Tp], v[:Tp],
                                meta.slot_mapping[:Tp], chunk, layer)
        return write_kv(cache, k[Tp:], v[Tp:], meta.slot_mapping[Tp:],
                        layer, unique=True)
    return write_kv(cache, k, v, meta.slot_mapping, layer,
                    unique=(mode == "unique"))


def write_kv_chunks(cache: KVCache, k, v, slot_mapping, chunk: int,
                    layer=None) -> KVCache:
    """Prefill fast path: chunk-runs written with dynamic_update_slice.

    The chunk-aligned prefill layout guarantees each `chunk`-token group is
    one sequence's CONSECUTIVE slots inside ONE page: runs start
    chunk-aligned in position space (window spans are budget-cut to chunk
    multiples, scheduler.py; prefix-cache resumes are block-aligned) and
    chunk | block_size, so a chunk never crosses a page boundary. Each
    chunk's K rows, V rows, and scale columns land with one
    dynamic_update_slice each instead of `chunk` scatter items — the
    per-item scatter loop measured ~128 ns/row, 14.7 ms (values) + 14.5 ms
    (scales) of a 78 ms T=2048 prefill step.

    Intra-chunk padding rows (a sequence's last, partially-filled chunk)
    write garbage into that sequence's own page PAST its live length:
    context_lens-capped reads never see them and later appends overwrite
    them. All-pad chunks target the reserved dummy page.
    """
    T = k.shape[0]
    bs = cache.block_size
    assert T % chunk == 0 and bs % chunk == 0, (T, chunk, bs)
    kv = jnp.stack([k, v], axis=1)                     # (T, 2, KVH, hd)
    sc = None
    if cache.quantized:
        kv, sc = quantize_rows(kv)
    kvf = kv.reshape(T, 2, -1).astype(cache.kv.dtype)
    krows, vrows = kvf[:, 0], kvf[:, 1]                # (T, KVH*hd)
    scrows = None
    if cache.quantized:
        scrows = jnp.concatenate([sc[:, 0], sc[:, 1]], axis=1)  # (T, 2*KVH)

    def body(c, carry):
        vals, scs = carry
        slot0 = slot_mapping[c * chunk]
        page = slot0 // bs
        off = slot0 % bs
        kc = jax.lax.dynamic_slice_in_dim(krows, c * chunk, chunk)
        vc = jax.lax.dynamic_slice_in_dim(vrows, c * chunk, chunk)
        if layer is None:
            vals = jax.lax.dynamic_update_slice(vals, kc[None], (page, off, 0))
            vals = jax.lax.dynamic_update_slice(
                vals, vc[None], (page, bs + off, 0))
        else:
            vals = jax.lax.dynamic_update_slice(
                vals, kc[None, None], (layer, page, off, 0))
            vals = jax.lax.dynamic_update_slice(
                vals, vc[None, None], (layer, page, bs + off, 0))
        if scs is not None:
            scc = jnp.swapaxes(jax.lax.dynamic_slice_in_dim(
                scrows, c * chunk, chunk), 0, 1)       # (2*KVH, chunk)
            if layer is None:
                scs = jax.lax.dynamic_update_slice(
                    scs, scc[None], (page, 0, off))
            else:
                scs = jax.lax.dynamic_update_slice(
                    scs, scc[None, None], (layer, page, 0, off))
        return vals, scs

    vals, scs = jax.lax.fori_loop(
        0, T // chunk, body, (cache.kv, cache.scale))
    return KVCache(vals, scs)


def write_kv(cache: KVCache, k, v, slot_mapping, layer=None,
             unique: bool = False) -> KVCache:
    """Scatter new K/V rows into the fused paged cache (quantizing if int8).

    Canonical value shape: (num_blocks, 2*block_size, KVH*head_dim) — K rows
    then V rows within a page — with a leading layers axis when `layer` is
    given (the scan-over-layers path: scattering straight into the stacked
    cache keeps the whole update in-place under donation). The token's K and
    V rows are scattered as 2T independent (row,) windows: keeping the
    scatter window one-dimensional (features only) lets XLA keep the
    cache's default tiled layout — a multi-dim window forces a relayout
    copy that tile-pads small window axes (see KVCache docstring).
    k/v: (T, KVH, head_dim). slot_mapping: (T,) flat slots.
    """
    bs = cache.block_size
    blocks = slot_mapping // bs
    offs = slot_mapping % bs
    kv = jnp.stack([k, v], axis=1)                     # (T, 2, KVH, hd)
    sc = None
    if cache.quantized:
        kv, sc = quantize_rows(kv)                     # int8, (T, 2, KVH) f32
    kvf = kv.reshape(kv.shape[0], 2, -1).astype(cache.kv.dtype)
    blocks2 = jnp.concatenate([blocks, blocks])
    rows2 = jnp.concatenate([offs, bs + offs])
    vals2 = jnp.concatenate([kvf[:, 0], kvf[:, 1]])    # (2T, KVH*hd)
    if layer is None:
        vals = cache.kv.at[blocks2, rows2, :].set(vals2, mode="drop")
    else:
        vals = cache.kv.at[layer, blocks2, rows2, :].set(vals2, mode="drop")
    if not cache.quantized:
        return KVCache(vals, None)
    # Scale update: one column of each touched (2*KVH, bs) page changes, but
    # a COLUMN-window scatter makes XLA layout-assignment prefer a transposed
    # scale layout while the attention kernels pin the standard one — it then
    # inserts a full-array layout copy of the scale stack INSIDE the layer
    # scan (measured: 477 MB x 28 layers of pure copy per step; engine decode
    # 210 ms vs 56 ms bf16). Recasting the update as FULL-PAGE-window
    # scatters leaves the layout free. Two forms:
    #   * unique=True (pure-decode steps: every live lane writes its own
    #     last page; padding lanes share the never-read dummy page, where
    #     last-wins garbage is harmless): gather the pages, blend the new
    #     column, one set — 2 page-traversals per token.
    #   * unique=False (prefill/mixed: one page can take many tokens):
    #     zero the column via mul, then add — duplicates commute, 4
    #     page-traversals per token.
    T = sc.shape[0]
    new = jnp.concatenate([sc[:, 0], sc[:, 1]], axis=1)   # (T, 2*KVH)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (T, 1, bs), 2)
              == offs[:, None, None])
    if unique:
        pages = _sel(cache.scale, layer, blocks)          # (T, 2*KVH, bs)
        pages = jnp.where(onehot, new[:, :, None], pages)
        if layer is None:
            scs = cache.scale.at[blocks].set(pages, mode="drop")
        else:
            scs = cache.scale.at[layer, blocks].set(pages, mode="drop")
        return KVCache(vals, scs)
    onehot = onehot.astype(jnp.float32)
    if layer is None:
        scs = cache.scale.at[blocks].mul(1.0 - onehot, mode="drop")
        scs = scs.at[blocks].add(new[:, :, None] * onehot, mode="drop")
    else:
        scs = cache.scale.at[layer, blocks].mul(1.0 - onehot, mode="drop")
        scs = scs.at[layer, blocks].add(new[:, :, None] * onehot, mode="drop")
    return KVCache(vals, scs)


def _sel(arr, layer, pages):
    return arr[pages] if layer is None else arr[layer, pages]


def _gather_plane(cache: KVCache, layer, pages, kvh, plane: int):
    bs = cache.block_size
    out = _sel(cache.kv, layer, pages)[..., plane * bs : (plane + 1) * bs, :]
    out = out.reshape(*out.shape[:-1], kvh, out.shape[-1] // kvh)
    out = out.astype(jnp.float32)
    if cache.quantized:
        sc = _sel(cache.scale, layer, pages)[
            ..., plane * kvh : (plane + 1) * kvh, :]
        # (..., KVH, bs) -> broadcast over hd
        out = out * jnp.swapaxes(sc, -1, -2)[..., None]
    return out


def gather_k_pages(cache: KVCache, layer, pages, kvh):
    """Dequantized K pages: (..., bs, KVH, hd) float32."""
    return _gather_plane(cache, layer, pages, kvh, 0)


def gather_v_pages(cache: KVCache, layer, pages, kvh):
    return _gather_plane(cache, layer, pages, kvh, 1)


# ---------------------------------------------------------------------------
# jnp reference backend (hardware-free; exact, O(T * max_kv) memory)
# ---------------------------------------------------------------------------

def ragged_attention_reference(q, cache: KVCache, meta: AttnMeta, scale: float,
                               layer=None):
    """Exact ragged paged attention by full gather. Test/CPU sizes only.

    q: (T, QH, hd) -> out (T, QH, hd).
    """
    T, QH, hd = q.shape
    bs = cache.block_size
    KVH = cache.kv.shape[-1] // hd
    S, maxB = meta.block_tables.shape
    G = QH // KVH

    # (S, maxB, bs, KVH, hd) -> (S, KVH, maxB*bs, hd)
    k_all = gather_k_pages(cache, layer, meta.block_tables, KVH).transpose(0, 3, 1, 2, 4).reshape(S, KVH, maxB * bs, hd)
    v_all = gather_v_pages(cache, layer, meta.block_tables, KVH).transpose(0, 3, 1, 2, 4).reshape(S, KVH, maxB * bs, hd)
    k_tok = k_all[meta.seg_ids]  # (T, KVH, Lk, hd)
    v_tok = v_all[meta.seg_ids]

    qf = q.reshape(T, KVH, G, hd).astype(jnp.float32)
    scores = jnp.einsum("tkgh,tklh->tkgl", qf, k_tok.astype(jnp.float32)) * scale

    kv_pos = jnp.arange(maxB * bs, dtype=jnp.int32)
    ctx = meta.context_lens[meta.seg_ids]  # (T,)
    valid = kv_pos[None, :] < ctx[:, None]                       # within context
    causal = kv_pos[None, :] <= meta.positions[:, None]          # no peeking ahead
    mask = (valid & causal)[:, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = jnp.where(mask, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("tkgl,tklh->tkgh", p / jnp.maximum(denom, 1e-20),
                     v_tok.astype(jnp.float32))
    return out.reshape(T, QH, hd).astype(q.dtype)


# ---------------------------------------------------------------------------
# jnp decode backend (memory-safe: streams pages with online softmax)
# ---------------------------------------------------------------------------

def paged_decode_attention_jnp(q, cache: KVCache, block_tables, context_lens,
                               scale: float, layer=None):
    """Flash-style decode: one query per slot, scan over page columns.

    q: (S, QH, hd) -> (S, QH, hd). Reads all maxB page columns (the Pallas
    kernel replaces this with per-sequence early exit).
    """
    S, QH, hd = q.shape
    bs = cache.block_size
    KVH = cache.kv.shape[-1] // hd
    G = QH // KVH
    maxB = block_tables.shape[1]
    qg = q.reshape(S, KVH, G, hd).astype(jnp.float32)

    def body(carry, j):
        m, l, acc = carry
        pages = block_tables[:, j]                       # (S,)
        k = gather_k_pages(cache, layer, pages, KVH)     # (S, bs, KVH, hd)
        v = gather_v_pages(cache, layer, pages, KVH)
        s = jnp.einsum("skgh,sbkh->skgb", qg, k) * scale
        pos = j * bs + jnp.arange(bs, dtype=jnp.int32)
        live = pos[None, :] < context_lens[:, None]      # (S, bs)
        s = jnp.where(live[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(live[:, None, None, :], p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("skgb,sbkh->skgh", p, v)
        return (m_new, l, acc), None

    init = (jnp.full((S, KVH, G), NEG_INF, jnp.float32),
            jnp.zeros((S, KVH, G), jnp.float32),
            jnp.zeros((S, KVH, G, hd), jnp.float32))
    (m, l, acc), _ = jax.lax.scan(body, init, jnp.arange(maxB, dtype=jnp.int32))
    out = acc / jnp.maximum(l, 1e-20)[..., None]
    return out.reshape(S, QH, hd).astype(q.dtype)


# ---------------------------------------------------------------------------
# jnp chunked ragged prefill (memory-safe: one page column in flight)
# ---------------------------------------------------------------------------

def ragged_prefill_attention_jnp(q, cache: KVCache, meta: AttnMeta,
                                 scale: float, chunk: int = 128, layer=None):
    """Flash-style varlen prefill over the chunk-aligned layout.

    q: (T, QH, hd) with T a multiple of `chunk`; every chunk's tokens belong
    to one sequence (meta.chunk_seg). Streams page columns with online
    softmax, so peak transient memory is O(T * block_size) scores.
    """
    T, QH, hd = q.shape
    bs = cache.block_size
    KVH = cache.kv.shape[-1] // hd
    G = QH // KVH
    C = T // chunk
    maxB = meta.block_tables.shape[1]

    qc = q.reshape(C, chunk, KVH, G, hd).astype(jnp.float32)
    pages_c = meta.block_tables[meta.chunk_seg]      # (C, maxB)
    ctx_c = meta.context_lens[meta.chunk_seg]        # (C,)
    pos_c = meta.positions.reshape(C, chunk)         # (C, chunk)

    def body(carry, j):
        m, l, acc = carry
        k = gather_k_pages(cache, layer, pages_c[:, j], KVH)  # (C, bs, KVH, hd)
        v = gather_v_pages(cache, layer, pages_c[:, j], KVH)
        s = jnp.einsum("cqkgh,cbkh->ckgqb", qc, k) * scale  # (C, KVH, G, chunk, bs)
        kv_pos = j * bs + jnp.arange(bs, dtype=jnp.int32)
        live = (kv_pos[None, None, :] < ctx_c[:, None, None]) & \
               (kv_pos[None, None, :] <= pos_c[:, :, None])     # (C, chunk, bs)
        lv = live[:, None, None, :, :]
        s = jnp.where(lv, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(lv, p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("ckgqb,cbkh->ckgqh", p, v)
        return (m_new, l, acc), None

    init = (jnp.full((C, KVH, G, chunk), NEG_INF, jnp.float32),
            jnp.zeros((C, KVH, G, chunk), jnp.float32),
            jnp.zeros((C, KVH, G, chunk, hd), jnp.float32))
    (m, l, acc), _ = jax.lax.scan(body, init, jnp.arange(maxB, dtype=jnp.int32))
    out = acc / jnp.maximum(l, 1e-20)[..., None]     # (C, KVH, G, chunk, hd)
    out = out.transpose(0, 3, 1, 2, 4).reshape(T, QH, hd)
    return out.astype(q.dtype)
