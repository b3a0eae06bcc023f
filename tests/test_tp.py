"""Tensor parallelism: the shard_map-ped step on an 8-device mesh must
reproduce the single-device computation bit-for-bit (modulo fp reassociation
in psum) — the TPU analogue of the reference's multi-rank determinism
requirement (ut/test_multi_rank_block_manager.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from nanovllm_tpu.models import dense
from nanovllm_tpu.ops import attention as attn_ops
from nanovllm_tpu.ops.attention import KVCache
from nanovllm_tpu.parallel import tp as tplib
from nanovllm_tpu.parallel.dryrun import build_tp_step, run_dryrun

TP = 8


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < TP:
        pytest.skip("needs 8 virtual devices")
    spec = dense.DenseSpec(
        vocab_size=256, hidden_size=64, num_layers=2, num_q_heads=8,
        num_kv_heads=8, head_dim=16, intermediate_size=128,
        max_position_embeddings=64, tie_word_embeddings=False, qk_norm=True,
    )
    params = dense.init_params(spec, jax.random.key(1), dtype=jnp.float32)
    return spec, params


def make_meta(S, maxB, bs, chunk, ctx, n_seqs, T):
    seg = np.zeros(T, np.int32)
    pos = np.zeros(T, np.int32)
    tables = np.zeros((S, maxB), np.int32)
    ctx_lens = np.zeros(S, np.int32)
    slots = np.zeros(T, np.int32)
    per = ctx
    t = 0
    page = 1
    for i in range(n_seqs):
        seg[t: t + per] = i
        pos[t: t + per] = np.arange(per)
        npages = -(-per // bs)
        tables[i, :npages] = np.arange(page, page + npages)
        flat = np.arange(per)
        slots[t: t + per] = tables[i, flat // bs] * bs + flat % bs
        ctx_lens[i] = per
        page += npages
        t += per
    last = np.zeros(S, np.int32)
    for i in range(n_seqs):
        last[i] = (i + 1) * per - 1
    return attn_ops.AttnMeta(
        seg_ids=jnp.asarray(seg), positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slots), block_tables=jnp.asarray(tables),
        context_lens=jnp.asarray(ctx_lens),
        last_token_idx=jnp.asarray(last),
        chunk_seg=jnp.asarray(seg[::chunk].copy()),
        num_seqs=jnp.asarray(n_seqs))


def test_tp8_matches_single_device(setup):
    spec, params = setup
    S, maxB, bs, chunk = 4, 4, 16, 16
    nblocks = S * maxB + 1
    T = 32  # 2 seqs x 16 tokens
    meta = make_meta(S, maxB, bs, chunk, ctx=16, n_seqs=2, T=T)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, T, dtype=np.int32))
    shape = (spec.num_layers, nblocks, 2 * bs,
             spec.num_kv_heads * spec.head_dim)

    # single-device reference
    c1 = KVCache(jnp.zeros(shape, jnp.float32))
    hidden, c1 = dense.forward(spec, params, ids, meta, c1)
    ref_logits = dense.compute_logits(spec, params, hidden)

    # tp=8
    mesh = tplib.make_mesh(tp=TP)
    lspec = tplib.local_spec(spec, TP)
    tparams = tplib.reorder_params_for_tp(jax.tree.map(np.asarray, params), spec, TP)
    pspecs = tplib.param_pspecs(spec, tparams)
    tparams = tplib.shard_params(tparams, spec, mesh)
    kvs = NamedSharding(mesh, tplib.kv_cache_pspec().kv)
    c8 = KVCache(jax.device_put(jnp.zeros(shape, jnp.float32), kvs))

    prefill, _ = build_tp_step(mesh, spec, lspec, pspecs=pspecs)
    temps = jnp.zeros((S,), jnp.float32)  # greedy
    tokens, c8 = prefill(tparams, c8, ids, meta, temps, jnp.uint32(0))

    # greedy tokens must match the argmax of the single-device logits
    np.testing.assert_array_equal(
        np.asarray(tokens)[:2], np.asarray(ref_logits.argmax(-1))[:2])
    # KV caches must agree exactly (sharded writes == dense writes)
    np.testing.assert_allclose(np.asarray(c8.k), np.asarray(c1.k), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c8.v), np.asarray(c1.v), rtol=1e-5, atol=1e-5)


def test_dryrun_smoke():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    run_dryrun(8)
