"""Multi-chip dry run: jit the full engine step over an n-device mesh with
real tensor-parallel shardings and execute one prefill + one decode step on
tiny shapes. Used by the driver (__graft_entry__.dryrun_multichip) with
virtual CPU devices, and by tests/test_tp.py."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nanovllm_tpu.models import dense
from nanovllm_tpu.ops import attention as attn_ops
from nanovllm_tpu.ops.sampler import sample_tokens
from nanovllm_tpu.parallel import tp as tplib


def build_tp_step(mesh, spec, lspec, prefill_attn=None, decode_attn=None,
                  quantized=False, pspecs=None):
    """Returns step(params, cache, input_ids, meta, temps, step_idx)
    pair jitted under shard_map over the 'tp' axis."""
    from jax import shard_map

    if prefill_attn is None:
        prefill_attn = dense.default_attn_fn
    if decode_attn is None:
        decode_attn = dense.default_attn_fn

    def local_step(params, cache, input_ids, meta, temps, step_idx,
                   is_prefill):
        attn_fn = prefill_attn if is_prefill else decode_attn
        hidden, cache = dense.forward(
            lspec, params, input_ids, meta, cache, attn_fn=attn_fn)
        logits = dense.compute_logits(lspec, params, hidden)
        key = jax.random.fold_in(jax.random.key(0), step_idx)
        tokens = sample_tokens(logits, temps, key)
        return tokens, cache

    if pspecs is None:
        pspecs = tplib.param_pspecs(spec)
    kv = tplib.kv_cache_pspec(quantized)
    rep = P()
    meta_specs = attn_ops.AttnMeta(rep, rep, rep, rep, rep, rep, rep, rep)

    def make(is_prefill):
        return shard_map(
            partial(local_step, is_prefill=is_prefill),
            mesh=mesh,
            in_specs=(pspecs, kv, rep, meta_specs, rep, rep),
            out_specs=(rep, kv),
            check_vma=False,
        )

    prefill = jax.jit(make(True), donate_argnums=(1,))
    decode = jax.jit(make(False), donate_argnums=(1,))
    return prefill, decode


def run_dryrun(n_devices: int) -> None:
    """Drive the REAL production engine (LLM -> LLMEngine -> ModelRunner)
    with tensor_parallel_size=n_devices: mesh construction, shard-major
    weight reorder, NamedSharding placement, sharded KV cache, and the
    shard_map'ed jitted step — then a raw build_tp_step smoke for the
    library-level path."""
    devices = jax.devices()
    assert len(devices) >= n_devices, \
        f"need {n_devices} devices, have {len(devices)} " \
        "(set XLA_FLAGS=--xla_force_host_platform_device_count)"

    from transformers import Qwen3Config

    from nanovllm_tpu import LLM, SamplingParams

    cfg = Qwen3Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=n_devices,
        num_key_value_heads=n_devices, head_dim=16,
        intermediate_size=16 * n_devices, vocab_size=64 * n_devices,
        max_position_embeddings=128)
    cfg.architectures = ["Qwen3ForCausalLM"]
    llm = LLM(cfg, tensor_parallel_size=n_devices, max_num_seqs=4,
              max_model_len=64, num_kvcache_blocks=32, kvcache_block_size=16,
              prefill_chunk=16, attention_backend="jnp", dtype="float32",
              warmup=False)
    out = llm.generate([[1, 2, 3, 4, 5], [7, 8, 9]],
                       SamplingParams(temperature=0.7, max_tokens=6),
                       use_tqdm=False)
    assert all(len(o["token_ids"]) == 6 for o in out), out

    _raw_step_dryrun(n_devices)


def _raw_step_dryrun(n_devices: int) -> None:
    tp = n_devices
    mesh = tplib.make_mesh(tp=tp)

    spec = dense.DenseSpec(
        vocab_size=512, hidden_size=128, num_layers=2, num_q_heads=16,
        num_kv_heads=8, head_dim=32, intermediate_size=256,
        max_position_embeddings=128, tie_word_embeddings=False, qk_norm=True,
    )
    lspec = tplib.local_spec(spec, tp)

    params = dense.init_params(spec, jax.random.key(0), dtype=jnp.float32)
    params = tplib.reorder_params_for_tp(
        jax.tree.map(np.asarray, params), spec, tp)
    pspecs = tplib.param_pspecs(spec, params)
    params = tplib.shard_params(params, spec, mesh)

    S, maxB, bs, chunk = 4, 4, 16, 16
    nblocks = S * maxB + 1
    kv_specs = tplib.kv_cache_pspec()
    shape = (spec.num_layers, nblocks, 2 * bs, spec.num_kv_heads * spec.head_dim)
    val_sh = NamedSharding(mesh, kv_specs.kv)
    cache = attn_ops.KVCache(
        jax.device_put(jnp.zeros(shape, jnp.float32), val_sh))

    prefill, decode = build_tp_step(mesh, spec, lspec, pspecs=pspecs)

    # --- one prefill step: 2 seqs x 32 tokens -----------------------------
    T = 64
    seg = np.repeat(np.arange(2, dtype=np.int32), 32)
    seg = np.pad(seg, (0, T - 64)) if T > 64 else seg
    pos = np.tile(np.arange(32, dtype=np.int32), 2)
    tables = np.zeros((S, maxB), np.int32)
    tables[0, :2] = [1, 2]
    tables[1, :2] = [3, 4]
    slots = np.concatenate([
        np.concatenate([1 * bs + np.arange(16), 2 * bs + np.arange(16)]),
        np.concatenate([3 * bs + np.arange(16), 4 * bs + np.arange(16)]),
    ]).astype(np.int32)
    meta = attn_ops.AttnMeta(
        seg_ids=jnp.asarray(seg), positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slots), block_tables=jnp.asarray(tables),
        context_lens=jnp.asarray([32, 32, 0, 0], dtype=jnp.int32),
        last_token_idx=jnp.asarray([31, 63, 0, 0], dtype=jnp.int32),
        chunk_seg=jnp.asarray(seg[::chunk].copy()),
        num_seqs=jnp.asarray(2))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, T, dtype=np.int32))
    temps = jnp.ones((S,), jnp.float32)
    tokens, cache = prefill(params, cache, ids, meta, temps, jnp.uint32(0))
    tokens.block_until_ready()

    # --- one decode step --------------------------------------------------
    dmeta = attn_ops.AttnMeta(
        seg_ids=jnp.arange(S, dtype=jnp.int32),
        positions=jnp.asarray([32, 32, 0, 0], dtype=jnp.int32),
        slot_mapping=jnp.asarray([2 * bs, 4 * bs, 0, 0], dtype=jnp.int32),
        block_tables=jnp.asarray(tables),
        context_lens=jnp.asarray([33, 33, 0, 0], dtype=jnp.int32),
        last_token_idx=jnp.arange(S, dtype=jnp.int32),
        chunk_seg=jnp.zeros(1, jnp.int32),
        num_seqs=jnp.asarray(2))
    dids = jnp.asarray(tokens[:S], dtype=jnp.int32)
    tokens2, cache = decode(params, cache, dids, dmeta, temps, jnp.uint32(1))
    tokens2.block_until_ready()
