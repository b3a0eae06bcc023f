"""Checkpoint loading: HF llama-family safetensors -> layer-stacked fused
params pytree.

Parity target: reference nanovllm/utils/loader.py:12-59 — streaming
*.safetensors shards and routing q/k/v + gate/up shards into fused parameters
(the reference's `packed_modules_mapping`). Here fusion lands in pre-allocated
numpy buffers per *stacked* parameter (all layers of a weight in one array),
which is what the scan-over-layers model consumes; `jax.device_put` with an
optional NamedSharding then places each stacked array directly into its final
(possibly mesh-sharded) layout without a host-side repack.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.models.dense import DenseSpec


def _iter_safetensors(path: str):
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    from safetensors import safe_open

    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)


def _iter_state_dict(sd: dict):
    for name, t in sd.items():
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        yield name, np.asarray(t)


def load_dense_params(
    spec: DenseSpec,
    source,
    dtype=jnp.bfloat16,
    rope_scaling: Optional[dict] = None,
    shard_fn: Optional[Callable[[str, np.ndarray], jax.Array]] = None,
):
    """Build the params pytree for models/dense.py.

    source: checkpoint dir (safetensors) or a torch/numpy state_dict.
    shard_fn(param_name, np_array) -> device array; defaults to device_put.
    """
    np_dtype = np.dtype(jnp.dtype(dtype).name) if dtype != jnp.bfloat16 else None
    D, L = spec.hidden_size, spec.num_layers

    def buf(shape):
        return np.zeros(shape, dtype=np.float32)

    layers = {
        "ln1": buf((L, D)),
        "ln2": buf((L, D)),
        "wqkv": buf((L, D, spec.qkv_size)),
        "wo": buf((L, spec.q_size, D)),
        "wgu": buf((L, D, 2 * spec.intermediate_size)),
        "wdown": buf((L, spec.intermediate_size, D)),
    }
    if spec.qkv_bias:
        layers["bqkv"] = buf((L, spec.qkv_size))
    if spec.qk_norm:
        layers["q_norm"] = buf((L, spec.head_dim))
        layers["k_norm"] = buf((L, spec.head_dim))
    top = {
        "embed": buf((spec.vocab_size, D)),
        "final_ln": buf((D,)),
        "lm_head": None if spec.tie_word_embeddings else buf((D, spec.vocab_size)),
    }

    qs, ks = spec.q_size, spec.kv_size
    # (stacked buffer, column slice, transpose?) per HF suffix
    col = {
        "self_attn.q_proj.weight": ("wqkv", slice(0, qs), True),
        "self_attn.k_proj.weight": ("wqkv", slice(qs, qs + ks), True),
        "self_attn.v_proj.weight": ("wqkv", slice(qs + ks, qs + 2 * ks), True),
        "self_attn.q_proj.bias": ("bqkv", slice(0, qs), False),
        "self_attn.k_proj.bias": ("bqkv", slice(qs, qs + ks), False),
        "self_attn.v_proj.bias": ("bqkv", slice(qs + ks, qs + 2 * ks), False),
        "self_attn.o_proj.weight": ("wo", slice(None), True),
        "self_attn.q_norm.weight": ("q_norm", slice(None), False),
        "self_attn.k_norm.weight": ("k_norm", slice(None), False),
        "input_layernorm.weight": ("ln1", slice(None), False),
        "post_attention_layernorm.weight": ("ln2", slice(None), False),
        "mlp.gate_proj.weight": ("wgu", slice(0, spec.intermediate_size), True),
        "mlp.up_proj.weight": ("wgu", slice(spec.intermediate_size, None), True),
        "mlp.down_proj.weight": ("wdown", slice(None), True),
    }

    it = _iter_safetensors(source) if isinstance(source, str) else _iter_state_dict(source)
    for name, tensor in it:
        tensor = np.asarray(tensor, dtype=np.float32)
        if name in ("model.embed_tokens.weight", "embed_tokens.weight"):
            top["embed"][:] = tensor[: spec.vocab_size]
        elif name in ("model.norm.weight", "norm.weight"):
            top["final_ln"][:] = tensor
        elif name == "lm_head.weight":
            if not spec.tie_word_embeddings:
                top["lm_head"][:] = tensor[: spec.vocab_size].T
        elif ".layers." in name:
            prefix, _, rest = name.partition(".layers.")
            idx_str, _, suffix = rest.partition(".")
            i = int(idx_str)
            entry = col.get(suffix)
            if entry is None:
                continue  # unknown per-layer tensor (e.g. rotary inv_freq buffers)
            tgt, sl, transpose = entry
            if tgt not in layers:
                continue
            value = tensor.T if transpose else tensor
            if layers[tgt].ndim == 3:
                layers[tgt][i][:, sl] = value
            else:
                layers[tgt][i][sl] = value
        # anything else (rotary buffers etc.) is derived, not loaded

    place = shard_fn or (lambda _name, arr: jax.device_put(arr))

    def finalize(name, arr):
        return place(name, np.asarray(arr, dtype=np.float32)).astype(dtype)

    params = {
        "embed": finalize("embed", top["embed"]),
        "layers": {k: finalize(f"layers.{k}", v) for k, v in layers.items()},
        "final_ln": finalize("final_ln", top["final_ln"]),
    }
    if spec.tie_word_embeddings:
        params["lm_head"] = params["embed"].T
    else:
        params["lm_head"] = finalize("lm_head", top["lm_head"])

    from nanovllm_tpu.ops.rope import rope_table

    cos, sin = rope_table(spec.head_dim, spec.max_position_embeddings,
                          spec.rope_theta, rope_scaling)
    params["rope_cos"], params["rope_sin"] = cos, sin
    return params


def load_moe_params(
    spec,  # MoESpec
    source,
    dtype=jnp.bfloat16,
    rope_scaling=None,
    shard_fn=None,
):
    """Build the params pytree for models/moe.py: dense attention weights
    plus router (D, E) and expert-stacked w_gate_up (E, D, 2I) / w_down
    (E, I, D) per layer (the reference loads experts as separate TP-sharded
    MLPs, qwen3_moe.py:96-122)."""
    b = spec.base
    D, L, E, I = b.hidden_size, b.num_layers, spec.num_experts, \
        spec.moe_intermediate_size

    def buf(shape):
        return np.zeros(shape, dtype=np.float32)

    layers = {
        "ln1": buf((L, D)),
        "ln2": buf((L, D)),
        "wqkv": buf((L, D, b.qkv_size)),
        "wo": buf((L, b.q_size, D)),
        "router": buf((L, D, E)),
        "w_gate_up": buf((L, E, D, 2 * I)),
        "w_down": buf((L, E, I, D)),
    }
    if not spec.uniform_sparse:
        layers["is_sparse"] = np.asarray(spec.sparse_mask, dtype=np.float32)
    if b.qk_norm:
        layers["q_norm"] = buf((L, b.head_dim))
        layers["k_norm"] = buf((L, b.head_dim))
    top = {
        "embed": buf((b.vocab_size, D)),
        "final_ln": buf((D,)),
        "lm_head": None if b.tie_word_embeddings else buf((D, b.vocab_size)),
    }

    qs, kssz = b.q_size, b.kv_size
    col = {
        "self_attn.q_proj.weight": ("wqkv", slice(0, qs), True),
        "self_attn.k_proj.weight": ("wqkv", slice(qs, qs + kssz), True),
        "self_attn.v_proj.weight": ("wqkv", slice(qs + kssz, qs + 2 * kssz), True),
        "self_attn.o_proj.weight": ("wo", slice(None), True),
        "self_attn.q_norm.weight": ("q_norm", slice(None), False),
        "self_attn.k_norm.weight": ("k_norm", slice(None), False),
        "input_layernorm.weight": ("ln1", slice(None), False),
        "post_attention_layernorm.weight": ("ln2", slice(None), False),
        "mlp.gate.weight": ("router", slice(None), True),
    }

    it = _iter_safetensors(source) if isinstance(source, str) else _iter_state_dict(source)
    for name, tensor in it:
        tensor = np.asarray(tensor, dtype=np.float32)
        if name in ("model.embed_tokens.weight", "embed_tokens.weight"):
            top["embed"][:] = tensor[: b.vocab_size]
        elif name in ("model.norm.weight", "norm.weight"):
            top["final_ln"][:] = tensor
        elif name == "lm_head.weight":
            if not b.tie_word_embeddings:
                top["lm_head"][:] = tensor[: b.vocab_size].T
        elif ".layers." in name:
            _, _, rest = name.partition(".layers.")
            idx_str, _, suffix = rest.partition(".")
            i = int(idx_str)
            if suffix.startswith("mlp.experts."):
                _, _, erest = suffix.partition("mlp.experts.")
                e_str, _, wname = erest.partition(".")
                e = int(e_str)
                if wname == "gate_proj.weight":
                    layers["w_gate_up"][i, e][:, :I] = tensor.T
                elif wname == "up_proj.weight":
                    layers["w_gate_up"][i, e][:, I:] = tensor.T
                elif wname == "down_proj.weight":
                    layers["w_down"][i, e] = tensor.T
                continue
            if suffix in ("mlp.gate_proj.weight", "mlp.up_proj.weight",
                          "mlp.down_proj.weight"):
                # Dense (mlp_only / non-sparse-step) layer: store the SwiGLU
                # MLP as I_dense/I_moe chunk-experts (models/moe.py
                # decomposition) — gate/up split by columns, down by rows.
                m = spec.dense_chunks
                for j in range(m):
                    if suffix == "mlp.gate_proj.weight":
                        layers["w_gate_up"][i, j][:, :I] = \
                            tensor[j * I:(j + 1) * I].T
                    elif suffix == "mlp.up_proj.weight":
                        layers["w_gate_up"][i, j][:, I:] = \
                            tensor[j * I:(j + 1) * I].T
                    else:
                        layers["w_down"][i, j] = tensor[:, j * I:(j + 1) * I].T
                continue
            entry = col.get(suffix)
            if entry is None:
                continue
            tgt, sl, transpose = entry
            if tgt not in layers:
                continue
            value = tensor.T if transpose else tensor
            if layers[tgt].ndim == 3:
                layers[tgt][i][:, sl] = value
            else:
                layers[tgt][i][sl] = value

    place = shard_fn or (lambda _name, arr: jax.device_put(arr))

    def finalize(name, arr):
        return place(name, np.asarray(arr, dtype=np.float32)).astype(dtype)

    params = {
        "embed": finalize("embed", top["embed"]),
        "layers": {k: finalize(f"layers.{k}", v) for k, v in layers.items()},
        "final_ln": finalize("final_ln", top["final_ln"]),
    }
    if b.tie_word_embeddings:
        params["lm_head"] = params["embed"].T
    else:
        params["lm_head"] = finalize("lm_head", top["lm_head"])

    from nanovllm_tpu.ops.rope import rope_table

    cos, sin = rope_table(b.head_dim, b.max_position_embeddings, b.rope_theta,
                          rope_scaling)
    params["rope_cos"], params["rope_sin"] = cos, sin
    return params


def load_vl_params(spec, source, dtype=jnp.bfloat16, shard_fn=None):
    """Qwen3-VL: text backbone (dense layout, language_model.* names) plus the
    vision tower pytree (reference qwen3_vl.py:1011-1056 name remapping)."""
    vspec = spec.vision
    ts = spec.text
    VD, VI, depth = vspec.hidden_size, vspec.intermediate_size, vspec.depth
    m2 = vspec.merge_unit
    n_ds = len(vspec.deepstack_indexes)
    patch_in = vspec.in_channels * vspec.temporal_patch_size * vspec.patch_size ** 2

    def buf(shape):
        return np.zeros(shape, np.float32)

    blocks = {
        "ln1_w": buf((depth, VD)), "ln1_b": buf((depth, VD)),
        "ln2_w": buf((depth, VD)), "ln2_b": buf((depth, VD)),
        "qkv_w": buf((depth, VD, 3 * VD)), "qkv_b": buf((depth, 3 * VD)),
        "proj_w": buf((depth, VD, VD)), "proj_b": buf((depth, VD)),
        "fc1_w": buf((depth, VD, VI)), "fc1_b": buf((depth, VI)),
        "fc2_w": buf((depth, VI, VD)), "fc2_b": buf((depth, VD)),
    }
    merger = {
        "norm_w": buf((VD,)), "norm_b": buf((VD,)),
        "fc1_w": buf((VD * m2, VD * m2)), "fc1_b": buf((VD * m2,)),
        "fc2_w": buf((VD * m2, vspec.out_hidden_size)),
        "fc2_b": buf((vspec.out_hidden_size,)),
    }
    ds_mergers = {
        "norm_w": buf((n_ds, VD * m2)), "norm_b": buf((n_ds, VD * m2)),
        "fc1_w": buf((n_ds, VD * m2, VD * m2)), "fc1_b": buf((n_ds, VD * m2)),
        "fc2_w": buf((n_ds, VD * m2, vspec.out_hidden_size)),
        "fc2_b": buf((n_ds, vspec.out_hidden_size)),
    }
    vision = {
        "patch_w": buf((patch_in, VD)), "patch_b": buf((VD,)),
        "pos_embed": buf((vspec.num_position_embeddings, VD)),
    }

    text_sd = {}
    it = _iter_safetensors(source) if isinstance(source, str) else _iter_state_dict(source)
    for name, tensor in it:
        tensor = np.asarray(tensor, dtype=np.float32)
        if ".visual." in name or name.startswith("visual."):
            _, _, vn = name.partition("visual.")
            if vn == "patch_embed.proj.weight":
                vision["patch_w"][:] = tensor.reshape(VD, -1).T
            elif vn == "patch_embed.proj.bias":
                vision["patch_b"][:] = tensor
            elif vn == "pos_embed.weight":
                vision["pos_embed"][:] = tensor
            elif vn.startswith("blocks."):
                _, _, r = vn.partition("blocks.")
                i_str, _, wn = r.partition(".")
                i = int(i_str)
                wmap = {
                    "norm1.weight": ("ln1_w", False), "norm1.bias": ("ln1_b", False),
                    "norm2.weight": ("ln2_w", False), "norm2.bias": ("ln2_b", False),
                    "attn.qkv.weight": ("qkv_w", True), "attn.qkv.bias": ("qkv_b", False),
                    "attn.proj.weight": ("proj_w", True), "attn.proj.bias": ("proj_b", False),
                    "mlp.linear_fc1.weight": ("fc1_w", True), "mlp.linear_fc1.bias": ("fc1_b", False),
                    "mlp.linear_fc2.weight": ("fc2_w", True), "mlp.linear_fc2.bias": ("fc2_b", False),
                }
                if wn in wmap:
                    tgt, tr = wmap[wn]
                    blocks[tgt][i] = tensor.T if tr else tensor
            elif vn.startswith("merger."):
                _, _, wn = vn.partition("merger.")
                wmap = {"norm.weight": ("norm_w", False), "norm.bias": ("norm_b", False),
                        "linear_fc1.weight": ("fc1_w", True), "linear_fc1.bias": ("fc1_b", False),
                        "linear_fc2.weight": ("fc2_w", True), "linear_fc2.bias": ("fc2_b", False)}
                if wn in wmap:
                    tgt, tr = wmap[wn]
                    merger[tgt][:] = tensor.T if tr else tensor
            elif vn.startswith("deepstack_merger_list."):
                _, _, r = vn.partition("deepstack_merger_list.")
                j_str, _, wn = r.partition(".")
                j = int(j_str)
                wmap = {"norm.weight": ("norm_w", False), "norm.bias": ("norm_b", False),
                        "linear_fc1.weight": ("fc1_w", True), "linear_fc1.bias": ("fc1_b", False),
                        "linear_fc2.weight": ("fc2_w", True), "linear_fc2.bias": ("fc2_b", False)}
                if wn in wmap:
                    tgt, tr = wmap[wn]
                    ds_mergers[tgt][j] = tensor.T if tr else tensor
        else:
            # text backbone: strip the VL wrapper prefixes down to the
            # "model.layers..." names load_dense_params expects
            tn = name
            for pre in ("model.language_model.", "language_model."):
                if tn.startswith(pre):
                    tn = "model." + tn[len(pre):]
                    break
            text_sd[tn] = tensor

    params = load_dense_params(ts, text_sd, dtype=dtype)
    place = shard_fn or (lambda _n, a: jax.device_put(a))

    def fin(tree):
        return {k: (fin(v) if isinstance(v, dict)
                    else place(k, np.asarray(v, np.float32)).astype(dtype))
                for k, v in tree.items()}

    params["vision"] = fin({"patch_w": vision["patch_w"],
                            "patch_b": vision["patch_b"],
                            "pos_embed": vision["pos_embed"],
                            "blocks": blocks, "merger": merger,
                            "ds_mergers": ds_mergers})
    return params
