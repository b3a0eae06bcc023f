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

    # -- compute ----------------------------------------------------------
    def forward(self, params, input_ids, meta, cache, attn_fn):
        return dense.forward(self.spec, params, input_ids, meta, cache,
                             attn_fn=attn_fn)

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

    def load_params(self, model_path, dtype, rng_key, shard_fn=None):
        from nanovllm_tpu.models import moe

        if model_path:
            from nanovllm_tpu.utils.loader import load_moe_params

            return load_moe_params(self.spec, model_path, dtype=dtype,
                                   rope_scaling=self.rope_scaling,
                                   shard_fn=shard_fn)
        return moe.init_params(self.spec, rng_key, dtype=dtype,
                               rope_scaling=self.rope_scaling)

    def forward(self, params, input_ids, meta, cache, attn_fn):
        from nanovllm_tpu.models import moe

        return moe.forward(self.spec, params, input_ids, meta, cache,
                           attn_fn=attn_fn)

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


ADAPTERS = {
    "Qwen3ForCausalLM": DenseAdapter,
    "Qwen3MoeForCausalLM": MoEAdapter,
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
