"""Architecture registry: HF `architectures[0]` -> model adapter.

Parity target: reference nanovllm/models/models_map.py:7-14 (Qwen2 aliased to
the Qwen3 implementation; MiniCPM4 and Llama as dense variants; MoE and VL as
dedicated adapters).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nanovllm_tpu.models import dense


class DenseAdapter:
    """Dense decoder families served by models/dense.py."""

    def __init__(self, config):
        hf = config.text_config
        self.hf_config = hf
        self.spec = dense.spec_from_hf(hf, max_model_len=config.max_model_len)
        self.rope_scaling = self._resolve_rope_scaling(hf, config.max_model_len)

    @staticmethod
    def _resolve_rope_scaling(hf, max_model_len) -> Optional[dict]:
        scaling = getattr(hf, "rope_scaling", None)
        if not scaling:
            return None
        scaling = dict(scaling)
        rtype = scaling.get("rope_type") or scaling.get("type")
        if rtype == "longrope":
            # MiniCPM4/Phi LongRoPE: pick the short or long factor table by
            # whether we serve beyond the original training window
            # (reference mini_cpm4.py:92-136 rebuilds on demand; our cache
            # is sized once for max_model_len, so the choice is static).
            from nanovllm_tpu.ops.rope import longrope_attn_factor

            orig = scaling.get("original_max_position_embeddings",
                               max_model_len)
            use_long = max_model_len > orig
            scaling["factor"] = scaling["long_factor" if use_long else "short_factor"]
            scaling["attention_factor"] = longrope_attn_factor(
                {"factor": max_model_len / orig if use_long else 1.0,
                 "original_max_position_embeddings": orig,
                 **({"attention_factor": scaling["attention_factor"]}
                    if "attention_factor" in scaling else {})})
        return scaling

    # -- params -----------------------------------------------------------
    def load_params(self, model_path: Optional[str], dtype, rng_key,
                    shard_fn=None):
        if model_path:
            from nanovllm_tpu.utils.loader import load_dense_params

            return load_dense_params(self.spec, model_path, dtype=dtype,
                                     rope_scaling=self.rope_scaling,
                                     shard_fn=shard_fn)
        return dense.init_params(self.spec, rng_key, dtype=dtype,
                                 rope_scaling=self.rope_scaling)

    # -- tensor parallelism ------------------------------------------------
    def tp_plan(self, params, tp: int):
        """Host-side TP prep: shard-major column reorder of the fused
        weights, PartitionSpecs for device placement, and switch the spec to
        the per-shard view so forward under shard_map sees local geometry.
        Call AFTER KV-cache sizing — the cache geometry properties report
        the LOCAL view afterwards."""
        from nanovllm_tpu.parallel import tp as tplib

        params = tplib.reorder_params_for_tp(params, self.spec, tp)
        pspecs = tplib.param_pspecs(self.spec, params, tp=tp)
        self.spec = tplib.local_spec(self.spec, tp)
        return params, pspecs

    # -- compute ----------------------------------------------------------
    def forward(self, params, input_ids, meta, cache, attn_fn,
                kv_mode="scatter"):
        return dense.forward(self.spec, params, input_ids, meta, cache,
                             attn_fn=attn_fn, kv_mode=kv_mode)

    def compute_logits(self, params, hidden):
        return dense.compute_logits(self.spec, params, hidden)

    # -- cache geometry ----------------------------------------------------
    @property
    def num_layers(self):
        return self.spec.num_layers

    @property
    def num_kv_heads(self):
        return self.spec.num_kv_heads

    @property
    def head_dim(self):
        return self.spec.head_dim


class MoEAdapter:
    """Qwen3-MoE family (models/moe.py)."""

    def __init__(self, config):
        from nanovllm_tpu.models import moe

        hf = config.text_config
        self.hf_config = hf
        self.spec = moe.spec_from_hf(hf, max_model_len=config.max_model_len)
        self.rope_scaling = DenseAdapter._resolve_rope_scaling(
            hf, config.max_model_len)
        self.quantized_init = bool(
            config.quantization == "int4"
            and getattr(config, "quantized_init", False))

    def load_params(self, model_path, dtype, rng_key, shard_fn=None):
        from nanovllm_tpu.models import moe

        if model_path:
            from nanovllm_tpu.utils.loader import load_moe_params

            return load_moe_params(self.spec, model_path, dtype=dtype,
                                   rope_scaling=self.rope_scaling,
                                   shard_fn=shard_fn)
        if self.quantized_init:
            return moe.init_params_quantized(
                self.spec, dtype=dtype, rope_scaling=self.rope_scaling)
        return moe.init_params(self.spec, rng_key, dtype=dtype,
                               rope_scaling=self.rope_scaling)

    def tp_plan(self, params, tp: int):
        """TP for attention + expert parallelism over the same mesh axis
        (experts stay replicated when num_experts % tp != 0)."""
        from nanovllm_tpu.parallel import tp as tplib

        params = tplib.reorder_params_for_tp(params, self.spec.base, tp)
        pspecs = tplib.moe_param_pspecs(self.spec, params, tp=tp)
        self.spec = tplib.local_moe_spec(self.spec, tp)
        return params, pspecs

    def forward(self, params, input_ids, meta, cache, attn_fn,
                kv_mode="scatter"):
        from nanovllm_tpu.models import moe

        return moe.forward(self.spec, params, input_ids, meta, cache,
                           attn_fn=attn_fn, kv_mode=kv_mode)

    def compute_logits(self, params, hidden):
        from nanovllm_tpu.models import moe

        return moe.compute_logits(self.spec, params, hidden)

    @property
    def num_layers(self):
        return self.spec.base.num_layers

    @property
    def num_kv_heads(self):
        return self.spec.base.num_kv_heads

    @property
    def head_dim(self):
        return self.spec.base.head_dim


class VLAdapter:
    """Qwen3-VL (models/qwen3_vl.py): vision tower cached per request,
    multimodal extras assembled host-side per batch."""

    def __init__(self, config):
        from nanovllm_tpu.models import qwen3_vl as vlmod

        self.config = config
        self.vlmod = vlmod
        self.spec = vlmod.spec_from_hf(config.hf_config,
                                       max_model_len=config.max_model_len)
        self.params = None  # set by load_params (vision encode needs them)
        self._encoders = {}

    # -- params -----------------------------------------------------------
    def load_params(self, model_path, dtype, rng_key, shard_fn=None):
        import jax
        import jax.numpy as jnp

        from nanovllm_tpu.models import dense

        if model_path:
            from nanovllm_tpu.utils.loader import load_vl_params

            params = load_vl_params(self.spec, model_path, dtype=dtype,
                                    shard_fn=shard_fn)
        else:
            params = dense.init_params(self.spec.text, rng_key, dtype=dtype)
            params["vision"] = self._init_vision(rng_key, dtype)
        self.params = params
        return params

    def _init_vision(self, key, dtype):
        import jax
        import jax.numpy as jnp

        v = self.spec.vision
        ks = jax.random.split(key, 12)
        m2 = v.merge_unit
        n_ds = len(v.deepstack_indexes)
        pin = v.in_channels * v.temporal_patch_size * v.patch_size ** 2

        def rnd(k, shape):
            return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

        def zeros(shape):
            return jnp.zeros(shape, dtype)

        def ones(shape):
            return jnp.ones(shape, dtype)

        d, i_ = v.hidden_size, v.intermediate_size
        return {
            "patch_w": rnd(ks[0], (pin, d)), "patch_b": zeros((d,)),
            "pos_embed": rnd(ks[1], (v.num_position_embeddings, d)),
            "blocks": {
                "ln1_w": ones((v.depth, d)), "ln1_b": zeros((v.depth, d)),
                "ln2_w": ones((v.depth, d)), "ln2_b": zeros((v.depth, d)),
                "qkv_w": rnd(ks[2], (v.depth, d, 3 * d)),
                "qkv_b": zeros((v.depth, 3 * d)),
                "proj_w": rnd(ks[3], (v.depth, d, d)),
                "proj_b": zeros((v.depth, d)),
                "fc1_w": rnd(ks[4], (v.depth, d, i_)), "fc1_b": zeros((v.depth, i_)),
                "fc2_w": rnd(ks[5], (v.depth, i_, d)), "fc2_b": zeros((v.depth, d)),
            },
            "merger": {
                "norm_w": ones((d,)), "norm_b": zeros((d,)),
                "fc1_w": rnd(ks[6], (d * m2, d * m2)), "fc1_b": zeros((d * m2,)),
                "fc2_w": rnd(ks[7], (d * m2, v.out_hidden_size)),
                "fc2_b": zeros((v.out_hidden_size,)),
            },
            "ds_mergers": {
                "norm_w": ones((n_ds, d * m2)), "norm_b": zeros((n_ds, d * m2)),
                "fc1_w": rnd(ks[8], (n_ds, d * m2, d * m2)),
                "fc1_b": zeros((n_ds, d * m2)),
                "fc2_w": rnd(ks[9], (n_ds, d * m2, v.out_hidden_size)),
                "fc2_b": zeros((n_ds, v.out_hidden_size)),
            },
        }

    def tp_plan(self, params, tp: int):
        """TP for the text backbone; the vision tower is replicated (it runs
        once per image outside the hot loop)."""
        from dataclasses import replace

        from nanovllm_tpu.parallel import tp as tplib

        params = tplib.reorder_params_for_tp(params, self.spec.text, tp)
        pspecs = tplib.vl_param_pspecs(self.spec, params, tp=tp)
        self.spec = replace(self.spec, text=tplib.local_spec(self.spec.text, tp))
        self.params = params  # refreshed to the sharded copy by ModelRunner
        return params, pspecs

    # -- compute ----------------------------------------------------------
    def forward(self, params, input_ids, meta, cache, attn_fn, extras=None,
                kv_mode="scatter"):
        return self.vlmod.text_forward(self.spec, params, input_ids, meta,
                                       cache, attn_fn=attn_fn, extras=extras,
                                       kv_mode=kv_mode)

    def compute_logits(self, params, hidden):
        return dense.compute_logits(self.spec.text, params, hidden)

    # -- multimodal extras -------------------------------------------------
    def _seq_mrope(self, seq):
        import numpy as np

        if getattr(seq, "mrope_prompt_pos", None) is None:
            grids = [tuple(int(x) for x in g) for g in (seq.image_grid_thw or [])]
            pos, nxt = self.vlmod.compute_mrope_positions(
                seq.prompt_token_ids, seq.vision_placeholders, grids,
                self.spec.vision.spatial_merge_size)
            seq.mrope_prompt_pos = pos
            seq.mrope_next = nxt
        n_extra = len(seq) - seq.num_prompt_tokens
        if n_extra <= 0:
            return seq.mrope_prompt_pos
        import numpy as np

        tail = seq.mrope_next + np.arange(n_extra, dtype=np.int32)
        return np.concatenate(
            [seq.mrope_prompt_pos, np.broadcast_to(tail, (3, n_extra))], axis=1)

    def _ensure_vision(self, seq):
        import jax
        import numpy as np

        if seq.cached_vision_tokens is not None or seq.pixel_values is None:
            return
        vts, dss = [], []
        row = 0
        pixels = np.asarray(seq.pixel_values, dtype=np.float32)
        for g in seq.image_grid_thw:
            g = tuple(int(x) for x in g)
            n = g[0] * g[1] * g[2]
            enc = self._encoders.get(g)
            if enc is None:
                import functools

                enc = jax.jit(functools.partial(
                    self.vlmod.encode_image, self.spec.vision, grid=g))
                self._encoders[g] = enc
            merged, ds = enc(self.params["vision"], pixels[row: row + n])
            vts.append(np.asarray(merged, np.float32))
            dss.append(np.asarray(ds, np.float32))
            row += n
        seq.cached_vision_tokens = vts
        seq.cached_deepstack_tokens = dss

    def prepare_extras(self, seqs, batch, n_prefill=None):
        """Multimodal step extras. Slots [0, n_prefill) are prefill windows
        (whole suffixes or chunked-prefill windows — bounds read from the
        batch itself: start = positions[t0], end = start + window span), the
        rest are decode lanes. Vision-token slices intersect each window
        with the placeholder ranges, so chunked prefill streams image
        embeddings window-by-window (the reference's vision-slice streaming,
        model_runner.py:454-495, generalized to interleaved windows)."""
        import numpy as np

        T = len(batch.input_ids)
        S = len(batch.context_lens)
        D = self.spec.text.hidden_size
        n_ds = max(len(self.spec.vision.deepstack_indexes), 1)
        mm = np.zeros((T, D), np.float32)
        mask = np.zeros((T,), bool)
        ds = np.zeros((n_ds, T, D), np.float32)
        pos3 = np.zeros((3, T), np.int32)
        if seqs is not None:
            if n_prefill is None:
                n_prefill = len(seqs) if batch.is_prefill else 0
            for i, seq in enumerate(seqs):
                t0 = batch.seq_token_offsets[i]
                if i < n_prefill:
                    start = int(batch.positions[t0])
                    span = int(batch.last_token_idx[i]) - t0 + 1
                    end = start + span
                    pos_all = self._seq_mrope(seq)
                    pos3[:, t0: t0 + span] = pos_all[:, start: end]
                    self._ensure_vision(seq)
                    for (p_start, p_len), vt, dsx in zip(
                            seq.vision_placeholders,
                            seq.cached_vision_tokens or [],
                            seq.cached_deepstack_tokens or []):
                        a = max(p_start, start)
                        b = min(p_start + p_len, end)
                        if a >= b:
                            continue
                        r0 = t0 + (a - start)
                        mm[r0: r0 + b - a] = vt[a - p_start: b - p_start]
                        mask[r0: r0 + b - a] = True
                        ds[:, r0: r0 + b - a] = dsx[:, a - p_start: b - p_start]
                else:
                    # Decode-lane mrope position is a pure function of the
                    # lane's TEXT position as laid out in the batch — for
                    # async-chain batches that position is the VIRTUAL
                    # length (len+1)-1, so reading it from the batch (not
                    # len(seq)-1) is what lets multimodal decode ride the
                    # chain without a per-step host sync.
                    p = int(batch.positions[t0])
                    if getattr(seq, "mrope_next", None) is None:
                        pos_val = p
                    else:
                        pos_val = seq.mrope_next + (p - seq.num_prompt_tokens)
                    # In mixed batches the decode lane's token row is
                    # seq_token_offsets[i] (= Tp + lane), NOT the slot index
                    # i — writing pos3[:, i] clobbers a prefill-region row.
                    pos3[:, t0] = pos_val
        return {"mm_embeds": mm, "visual_mask": mask, "deepstack": ds,
                "mrope_pos": pos3}

    # -- cache geometry ----------------------------------------------------
    @property
    def num_layers(self):
        return self.spec.text.num_layers

    @property
    def num_kv_heads(self):
        return self.spec.text.num_kv_heads

    @property
    def head_dim(self):
        return self.spec.text.head_dim


ADAPTERS = {
    "Qwen3ForCausalLM": DenseAdapter,
    "Qwen3MoeForCausalLM": MoEAdapter,
    "Qwen3VLForConditionalGeneration": VLAdapter,
    "Qwen2ForCausalLM": DenseAdapter,
    "LlamaForCausalLM": DenseAdapter,
    "MiniCPMForCausalLM": DenseAdapter,
    "MiniCPM3ForCausalLM": DenseAdapter,
    "MiniCPM4ForCausalLM": DenseAdapter,
}


def get_adapter(config):
    arch = (getattr(config.hf_config, "architectures", None) or [None])[0]
    if arch is None:
        raise ValueError("hf_config has no architectures[]")
    cls = ADAPTERS.get(arch)
    if cls is None:
        raise ValueError(f"unsupported architecture {arch!r}; known: {sorted(ADAPTERS)}")
    return cls(config)
