"""Attention backend selection for the Pallas kernels.

Exposes the same (prefill_fn, decode_fn) pair as the jnp backend
(engine/model_runner.py); both take (q, k_cache, v_cache, meta, scale, layer)
with the stacked (L, NB, bs, KVH, hd) caches.
"""

from __future__ import annotations

from nanovllm_tpu.ops.pallas.decode_attention import paged_decode_attention
from nanovllm_tpu.ops.pallas.prefill_attention import ragged_prefill_attention


def get_attention_fns(config):
    cq = config.prefill_chunk

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
