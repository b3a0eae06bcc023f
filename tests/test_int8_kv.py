"""INT8 KV-cache correctness: quantize-on-write + fused dequant must stay
within quantization tolerance of the fp32 cache on every backend."""

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu.ops.attention import (
    AttnMeta,
    KVCache,
    paged_decode_attention_jnp,
    quantize_rows,
    ragged_attention_reference,
    write_kv,
)

BS, MAXB, S = 16, 6, 4
KVH, G, HD = 2, 3, 32
QH = KVH * G


def make_caches(nblocks, layers=1):
    fp = KVCache.zeros(layers, nblocks, BS, KVH, HD, jnp.float32)
    q8 = KVCache.zeros(layers, nblocks, BS, KVH, HD, quantized=True)
    return fp, q8


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((10, KVH, HD), dtype=np.float32)) * 3.0
    q, scale = quantize_rows(x)
    deq = q.astype(jnp.float32) * scale[..., None]
    err = np.abs(np.asarray(deq) - np.asarray(x)).max()
    amax = float(jnp.abs(x).max())
    assert err <= amax / 127.0 + 1e-6


def test_write_and_attend_int8_close_to_fp32():
    rng = np.random.default_rng(1)
    nblocks = S * MAXB + 1
    fp, q8 = make_caches(nblocks)

    ctx_lens = (24, 1, 60, 9)
    tables = np.zeros((S, MAXB), np.int32)
    nxt = 1
    slots_all, kvs = [], []
    for i, ctx in enumerate(ctx_lens):
        npages = -(-ctx // BS)
        tables[i, :npages] = np.arange(nxt, nxt + npages)
        pos = np.arange(ctx)
        slots_all.append(tables[i, pos // BS] * BS + pos % BS)
        nxt += npages
    slots = jnp.asarray(np.concatenate(slots_all).astype(np.int32))
    T = slots.shape[0]
    k = jnp.asarray(rng.standard_normal((T, KVH, HD), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((T, KVH, HD), dtype=np.float32))
    fp = write_kv(fp, k, v, slots, layer=0)
    q8 = write_kv(q8, k, v, slots, layer=0)

    q = jnp.asarray(rng.standard_normal((S, QH, HD), dtype=np.float32))
    meta = AttnMeta(
        seg_ids=jnp.arange(S, dtype=jnp.int32),
        positions=jnp.asarray([max(c - 1, 0) for c in ctx_lens], dtype=jnp.int32),
        slot_mapping=jnp.zeros(S, jnp.int32),
        block_tables=jnp.asarray(tables),
        context_lens=jnp.asarray(ctx_lens, dtype=jnp.int32),
        last_token_idx=jnp.arange(S, dtype=jnp.int32),
        chunk_seg=jnp.zeros(1, jnp.int32),
        num_seqs=jnp.asarray(S))

    ref = ragged_attention_reference(q, fp, meta, HD ** -0.5, layer=0)
    # jnp int8 paths
    out_ref8 = ragged_attention_reference(q, q8, meta, HD ** -0.5, layer=0)
    out_dec8 = paged_decode_attention_jnp(q, q8, meta.block_tables,
                                          meta.context_lens, HD ** -0.5, layer=0)
    for out in (out_ref8, out_dec8):
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.05, atol=0.05)

    # pallas int8 decode (interpret mode)
    from nanovllm_tpu.ops.pallas.decode_attention import paged_decode_attention

    out_pallas = paged_decode_attention(q, q8, meta.block_tables,
                                        meta.context_lens, 0,
                                        scale=HD ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    # and it must agree closely with the jnp int8 path (same quantized data)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_dec8),
                               rtol=2e-2, atol=2e-2)


def test_engine_e2e_int8_kv_matches_fp32_logits():
    """Full engine with kv_cache_dtype=int8: greedy outputs should match the
    fp32-cache engine on a tiny model (logit gaps dwarf quantization noise
    when weights are reasonably scaled)."""
    from transformers import Qwen3Config

    from nanovllm_tpu import LLM, SamplingParams

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )
    kwargs = dict(max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
                  num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
                  prefill_chunk=16, attention_backend="jnp", warmup=False)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 127, size=20))]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    llm_fp = LLM(cfg, dtype="float32", **kwargs)
    out_fp = llm_fp.generate(prompts, sp, use_tqdm=False)
    llm_q8 = LLM(cfg, dtype="float32", kv_cache_dtype="int8", **kwargs)
    out_q8 = llm_q8.generate(prompts, sp, use_tqdm=False)
    # token-level agreement on the first tokens (tiny random models have
    # near-uniform logits, so allow the tail to diverge)
    assert out_fp[0]["token_ids"][:2] == out_q8[0]["token_ids"][:2]
    assert len(out_q8[0]["token_ids"]) == 8


def test_write_kv_chunks_matches_scatter():
    """write_kv_chunks / write_kv_mode must equal the general scatter on a
    chunk-aligned layout: multi-sequence runs, off-page-start (offset 128 in
    a 256 page), a partially-live chunk, an all-pad dummy chunk, and the
    mixed [prefill | decode] split — bf16 and int8."""
    import jax.numpy as jnp
    import numpy as np

    from nanovllm_tpu.ops import attention as attn_ops

    rng = np.random.default_rng(7)
    L, NB, bs, KVH, hd, CQ = 2, 8, 256, 2, 16, 128
    dummy = (NB - 1) * bs

    # seq A: positions 128..383 in pages 2,3 (starts mid-page);
    # seq B: positions 0..127 in page 5; last chunk = pure padding.
    slots = np.concatenate([
        2 * bs + np.arange(128, 256),          # A chunk 0 (page 2, off 128)
        3 * bs + np.arange(0, 128),            # A chunk 1 (page 3, off 0)
        5 * bs + np.arange(0, 128),            # B chunk 2 (page 5, off 0)
        np.full(128, dummy),                   # pad chunk -> dummy page
    ]).astype(np.int32)
    T = slots.shape[0]
    k = jnp.asarray(rng.standard_normal((T, KVH, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, KVH, hd)), jnp.float32)

    for quant in (False, True):
        cache = attn_ops.KVCache.zeros(L, NB, bs, KVH, hd,
                                       dtype=jnp.float32, quantized=quant)
        a = attn_ops.write_kv(cache, k, v, jnp.asarray(slots), layer=1)
        b = attn_ops.write_kv_chunks(cache, k, v, jnp.asarray(slots), CQ,
                                     layer=1)
        # Compare only the slots this step wrote (chunked mode may write
        # garbage into pad rows of the dummy page, which is reserved).
        real = slots[slots != dummy]
        pg, off = real // bs, real % bs
        np.testing.assert_array_equal(np.asarray(a.kv[1, pg, off]),
                                      np.asarray(b.kv[1, pg, off]))
        np.testing.assert_array_equal(np.asarray(a.kv[1, pg, bs + off]),
                                      np.asarray(b.kv[1, pg, bs + off]))
        if quant:
            np.testing.assert_array_equal(
                np.asarray(a.scale[1, pg, :, off]),
                np.asarray(b.scale[1, pg, :, off]))

    # Mixed: prefill region (2 chunks) + 4 decode rows on distinct pages.
    Td = 4
    dslots = np.array([0 * bs + 5, 1 * bs + 9, 4 * bs + 77, dummy],
                      np.int32)
    mslots = np.concatenate([slots[:2 * CQ], dslots])
    km = jnp.asarray(rng.standard_normal((2 * CQ + Td, KVH, hd)), jnp.float32)
    vm = jnp.asarray(rng.standard_normal((2 * CQ + Td, KVH, hd)), jnp.float32)
    meta = attn_ops.AttnMeta(
        seg_ids=jnp.zeros(2 * CQ + Td, jnp.int32),
        positions=jnp.zeros(2 * CQ + Td, jnp.int32),
        slot_mapping=jnp.asarray(mslots),
        block_tables=jnp.zeros((Td, 4), jnp.int32),
        context_lens=jnp.zeros(Td, jnp.int32),
        last_token_idx=jnp.zeros(Td, jnp.int32),
        chunk_seg=jnp.zeros(2, jnp.int32),
        num_seqs=jnp.asarray(Td))
    cache = attn_ops.KVCache.zeros(L, NB, bs, KVH, hd,
                                   dtype=jnp.float32, quantized=True)
    a = attn_ops.write_kv(cache, km, vm, jnp.asarray(mslots), layer=0)
    b = attn_ops.write_kv_mode(cache, km, vm, meta, 0, mode="mixed")
    real = mslots[mslots != dummy]
    pg, off = real // bs, real % bs
    np.testing.assert_array_equal(np.asarray(a.kv[0, pg, off]),
                                  np.asarray(b.kv[0, pg, off]))
    np.testing.assert_array_equal(np.asarray(a.scale[0, pg, :, off]),
                                  np.asarray(b.scale[0, pg, :, off]))
