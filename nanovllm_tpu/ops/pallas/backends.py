"""Attention backend selection for the Pallas kernels.

Exposes the same (prefill_fn, decode_fn) pair as the jnp backend
(engine/model_runner.py); both take (q, k_cache, v_cache, meta, scale, layer)
with the stacked (L, NB, bs, KVH, hd) caches.
"""

from __future__ import annotations

from nanovllm_tpu.ops.pallas.decode_attention import paged_decode_attention
from nanovllm_tpu.ops.pallas.prefill_attention import ragged_prefill_attention


def get_attention_fns(config, interpret: bool | None = None):
    """(prefill_fn, decode_fn) over the Pallas kernels.

    interpret=None: Mosaic on TPU, interpret mode elsewhere — so
    attention_backend="pallas" on a CPU mesh runs the SAME kernel code
    (index math, shard_map-local geometry) hardware-free, the strongest
    multi-chip correctness evidence a 1-chip environment can produce."""
    import jax

    if interpret is None:
        interpret = jax.local_devices()[0].platform != "tpu"
    hf = config.text_config
    kvh = getattr(hf, "num_key_value_heads", None) or hf.num_attention_heads
    hd = getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads
    tp = config.tensor_parallel_size
    local_kvh = kvh // tp if kvh % tp == 0 else kvh
    if (local_kvh * hd) % 128 and not interpret:
        # Mosaic requires lane-tile-aligned KV page rows — checked on the
        # PER-SHARD geometry the kernels actually see under shard_map.
        # Sub-128 rows only occur on toy test models — fall back to the jnp
        # backend (the runner catches ImportError and logs it).
        raise ImportError(
            f"pallas kernels need local kv_heads*head_dim % 128 == 0 "
            f"(got {local_kvh}*{hd} at tp={tp})")
    cq = config.prefill_chunk

    def prefill(q, cache, meta, scale, layer=None):
        C = q.shape[0] // cq
        chunk_pos = meta.positions.reshape(C, cq)[:, 0]
        return ragged_prefill_attention(
            q, cache, meta.chunk_seg, chunk_pos,
            meta.block_tables, meta.context_lens, layer, cq=cq, scale=scale,
            interpret=interpret)

    def decode(q, cache, meta, scale, layer=None):
        return paged_decode_attention(
            q, cache, meta.block_tables, meta.context_lens,
            layer, scale=scale, interpret=interpret)

    return prefill, decode
