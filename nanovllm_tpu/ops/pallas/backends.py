"""Attention backend selection for the Pallas kernels.

Exposes the same (prefill_fn, decode_fn) pair as the jnp backend
(engine/model_runner.py); both take (q, k_cache, v_cache, meta, scale, layer)
with the stacked (L, NB, bs, KVH, hd) caches.
"""

from __future__ import annotations

import os

from nanovllm_tpu.ops.pallas.decode_attention import paged_decode_attention as _decode_v3
from nanovllm_tpu.ops.pallas.decode_attention_v4 import paged_decode_attention_v4 as _decode_v4
from nanovllm_tpu.ops.pallas.prefill_attention import ragged_prefill_attention


def get_attention_fns(config):
    hf = config.text_config
    kvh = getattr(hf, "num_key_value_heads", None) or hf.num_attention_heads
    hd = getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads
    if (kvh * hd) % 128:
        # Mosaic requires lane-tile-aligned KV page rows; sub-128 rows only
        # occur on toy test models — fall back to the jnp backend (the
        # runner catches ImportError and logs it).
        raise ImportError(
            f"pallas kernels need kv_heads*head_dim % 128 == 0 "
            f"(got {kvh}*{hd})")
    cq = config.prefill_chunk
    paged_decode_attention = (
        _decode_v4 if os.environ.get("NANOVLLM_DECODE_KERNEL") == "v4"
        else _decode_v3)

    def prefill(q, cache, meta, scale, layer=None):
        C = q.shape[0] // cq
        chunk_pos = meta.positions.reshape(C, cq)[:, 0]
        return ragged_prefill_attention(
            q, cache, meta.chunk_seg, chunk_pos,
            meta.block_tables, meta.context_lens, layer, cq=cq, scale=scale)

    def decode(q, cache, meta, scale, layer=None):
        return paged_decode_attention(
            q, cache, meta.block_tables, meta.context_lens,
            layer, scale=scale)

    return prefill, decode
