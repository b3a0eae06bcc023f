"""Tensor parallelism over a jax device mesh.

Replaces the reference's per-class Megatron sharding + HCCL process groups
(reference nanovllm/layers/linear.py:54-153, embed_head.py:9-66,
model_runner.py:39-46) with mesh-axis sharding: weights carry NamedShardings,
the step runs under shard_map, and the two per-layer all-reduces (attention
output + MLP down, reference call stack SURVEY §3.3) become `lax.psum` over
the 'tp' axis, scheduled by XLA onto ICI.

Fused weights (qkv, gate|up) are stored in *shard-major* column order — the
columns of shard s are [q_s | k_s | v_s] — so a plain PartitionSpec on the
last axis gives every shard exactly its own heads. The reorder happens once
at load time on host.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nanovllm_tpu.models.dense import DenseSpec

TP_AXIS = "tp"


def make_mesh(tp: int, devices=None) -> Mesh:
    """1-axis tp mesh over `devices` (default: the first tp global devices).
    Data parallelism is NOT a second mesh axis here: replica serving is a
    pool of independent engines each on its own tp mesh
    (parallel/replicas.py) — continuous batching makes per-replica
    schedules diverge, so a joint (dp, tp) step would force lockstep
    padding across replicas."""
    devs = np.asarray(devices if devices is not None
                      else jax.devices()[:tp]).reshape(tp)
    return Mesh(devs, (TP_AXIS,))


def local_spec(spec: DenseSpec, tp: int) -> DenseSpec:
    """The per-shard view of the architecture."""
    if tp == 1:
        return spec
    assert spec.num_kv_heads % tp == 0, \
        f"tp={tp} must divide num_kv_heads={spec.num_kv_heads}"
    assert spec.num_q_heads % tp == 0
    assert spec.intermediate_size % tp == 0
    return replace(
        spec,
        num_q_heads=spec.num_q_heads // tp,
        num_kv_heads=spec.num_kv_heads // tp,
        intermediate_size=spec.intermediate_size // tp,
        tp_axis=TP_AXIS,
        lm_head_tp=spec.vocab_size % tp == 0,
    )


def prune_to(params: dict, pspecs: dict) -> dict:
    """Restrict a pspec dict to the keys present in `params` (quantization
    scales etc. are optional entries)."""
    out = {}
    for key, value in params.items():
        out[key] = (prune_to(value, pspecs[key]) if isinstance(value, dict)
                    else pspecs[key])
    return out


def param_pspecs(spec: DenseSpec, params: dict | None = None,
                 tp: int | None = None) -> dict:
    """PartitionSpecs for the dense params pytree (shard-major fused layout).
    Pass `params` to prune optional entries to the actual structure. Pass
    `tp` to replicate the lm_head when the vocab does not divide it."""
    vocab_sharded = tp is None or spec.vocab_size % tp == 0
    layers = {
        "ln1": P(), "ln2": P(),
        "wqkv": P(None, None, TP_AXIS),
        "wo": P(None, TP_AXIS, None),
        "wgu": P(None, None, TP_AXIS),
        "wdown": P(None, TP_AXIS, None),
        # int8 per-out-channel scales follow their weight's output axis
        "wqkv_scale": P(None, TP_AXIS),
        "wgu_scale": P(None, TP_AXIS),
        "wo_scale": P(),
        "wdown_scale": P(),
    }
    if spec.qkv_bias:
        layers["bqkv"] = P(None, TP_AXIS)
    if spec.qk_norm:
        layers["q_norm"] = P()
        layers["k_norm"] = P()
    pspecs = {
        "embed": P(),
        "layers": layers,
        "final_ln": P(),
        "lm_head": P(None, TP_AXIS) if vocab_sharded else P(),
        "lm_head_scale": P(TP_AXIS) if vocab_sharded else P(),
        "rope_cos": P(),
        "rope_sin": P(),
    }
    if params is not None:
        _int4_scale_fixup(layers, params.get("layers", {}))
        lm_sc = params.get("lm_head_scale")
        if lm_sc is not None and getattr(lm_sc, "ndim", 1) == 2:
            # int4 lm_head scale (D/g, V): follows the vocab (output) axis
            pspecs["lm_head_scale"] = P(None, TP_AXIS) if vocab_sharded else P()
        elif lm_sc is not None and getattr(lm_sc, "ndim", 1) == 3:
            # asymmetric int4 lm_head scale (2, D/g, V)
            pspecs["lm_head_scale"] = (P(None, None, TP_AXIS)
                                       if vocab_sharded else P())
    return prune_to(params, pspecs) if params is not None else pspecs


def _int4_scale_fixup(layer_pspecs: dict, player: dict) -> None:
    """int4 scales are group-wise (.., K/g, N) — one rank higher than int8's
    per-channel (.., N) — and shard along the same axis as their weight:
    output axis for column-parallel, input-group axis for row-parallel.
    Asymmetric int4 scales carry one more size-2 [scale, min] axis
    (.., 2, K/g, N); the sharded axis is the same."""
    int4_specs = {
        "wqkv_scale": P(None, None, TP_AXIS),
        "wgu_scale": P(None, None, TP_AXIS),
        "wo_scale": P(None, TP_AXIS, None),
        "wdown_scale": P(None, TP_AXIS, None),
    }
    asym_specs = {
        "wqkv_scale": P(None, None, None, TP_AXIS),
        "wgu_scale": P(None, None, None, TP_AXIS),
        "wo_scale": P(None, None, TP_AXIS, None),
        "wdown_scale": P(None, None, TP_AXIS, None),
    }
    for name, spec4 in int4_specs.items():
        sc = player.get(name)
        if sc is not None and getattr(sc, "ndim", 0) == 3:
            layer_pspecs[name] = spec4
        elif sc is not None and getattr(sc, "ndim", 0) == 4:
            layer_pspecs[name] = asym_specs[name]


def moe_param_pspecs(mspec, params: dict | None = None,
                     tp: int | None = None) -> dict:
    """PartitionSpecs for a MoE params pytree: attention weights shard like
    the dense model; experts shard on the EXPERT axis over the same mesh
    axis (expert parallelism, models/moe.py ep_axis path); the router is
    replicated. Expert sharding needs num_experts % tp == 0, else experts
    stay replicated."""
    base = param_pspecs(mspec.base, tp=tp)
    ep = tp is None or mspec.num_experts % tp == 0
    if not ep:
        import logging

        logging.getLogger(__name__).warning(
            "num_experts=%d not divisible by tp=%d: expert weights stay "
            "REPLICATED on every shard (no expert parallelism, full expert "
            "memory per chip)", mspec.num_experts, tp)
    exp = P(None, TP_AXIS, None, None) if ep else P()
    base["layers"].update({
        "router": P(),
        "w_gate_up": exp,
        "w_down": exp,
        # group-wise expert quantization scales ride the expert axis
        "w_gate_up_scale": exp,
        "w_down_scale": exp,
        "is_sparse": P(),
    })
    if params is not None:
        _int4_scale_fixup(base["layers"], params.get("layers", {}))
    return prune_to(params, base) if params is not None else base


def local_moe_spec(mspec, tp: int):
    """Per-shard MoE view: localized attention + EP over the tp axis."""
    if tp == 1:
        return mspec
    base = local_spec(mspec.base, tp)
    if mspec.num_experts % tp == 0:
        return replace(mspec, base=base, ep_axis=TP_AXIS,
                       num_local_experts=mspec.num_experts // tp)
    return replace(mspec, base=base)


def vl_param_pspecs(vspec, params: dict, tp: int | None = None) -> dict:
    """PartitionSpecs for Qwen3-VL params: the text backbone shards like the
    dense model; the vision tower (a tiny fraction of the weights, run once
    per image) is replicated."""
    text = param_pspecs(vspec.text,
                        {k: v for k, v in params.items() if k != "vision"},
                        tp=tp)

    def all_rep(tree):
        return {k: all_rep(v) if isinstance(v, dict) else P()
                for k, v in tree.items()}

    out = {}
    for key, value in params.items():
        if key == "vision":
            out[key] = all_rep(value)
        else:
            out[key] = prune_to({key: value}, {key: text[key]})[key] \
                if isinstance(value, dict) else text[key]
    return out


def kv_cache_pspec(quantized: bool = False):
    """KVCache pspecs (fused layout): values (L, NB, 2*bs, KVH*hd) shard
    the flat feature axis (contiguous column blocks are whole kv heads);
    int8 scales (L, NB, 2*KVH, bs) shard the fused kv-head row axis. Note
    the scale rows are only meaningful SHARD-LOCALLY: each shard writes and
    reads its (2*KVH/tp, bs) block as [local K rows | local V rows] under
    shard_map, so the global concatenation is not the tp=1 row order — no
    code path reads the global scale array across shards."""
    from nanovllm_tpu.ops.attention import KVCache

    val = P(None, None, None, TP_AXIS)
    sc = P(None, None, TP_AXIS, None) if quantized else None
    return KVCache(val, sc)


def _shard_major(arr, seg_sizes, tp: int, axis: int = -1):
    """Reorder concatenated segments [A|B|...] so columns become
    [A_0|B_0|...|A_1|B_1|...] (shard-major)."""
    parts = []
    start = 0
    for size in seg_sizes:
        seg = np.take(arr, np.arange(start, start + size), axis=axis)
        # split the segment into tp pieces along `axis`
        parts.append(np.split(seg, tp, axis=axis))
        start += size
    blocks = []
    for s in range(tp):
        for p in parts:
            blocks.append(p[s])
    return np.concatenate(blocks, axis=axis)


def reorder_params_for_tp(params: dict, spec: DenseSpec, tp: int) -> dict:
    """Host-side column reorder of the fused weights (numpy or jax arrays)."""
    if tp == 1:
        return params
    out = dict(params)
    layers = dict(params["layers"])
    qkv_segs = (spec.q_size, spec.kv_size, spec.kv_size)
    gu_segs = (spec.intermediate_size, spec.intermediate_size)
    for name, segs in (("wqkv", qkv_segs), ("bqkv", qkv_segs),
                       ("wqkv_scale", qkv_segs), ("wgu", gu_segs),
                       ("wgu_scale", gu_segs)):
        if name in layers:
            layers[name] = _shard_major(np.asarray(layers[name]), segs, tp)
    out["layers"] = layers
    return out


def shard_params(params: dict, spec: DenseSpec, mesh: Mesh) -> dict:
    pspecs = param_pspecs(spec)

    def walk(tree, specs):
        out = {}
        for key, value in tree.items():
            if isinstance(value, dict):
                out[key] = walk(value, specs[key])
            else:
                out[key] = jax.device_put(
                    value, NamedSharding(mesh, specs[key]))
        return out

    return walk(params, pspecs)
