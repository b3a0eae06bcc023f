"""MiniCPM4 support: spec scaling knobs, LongRoPE tables, engine e2e.

(The HF MiniCPM implementation is trust_remote_code and unavailable offline,
so parity is checked structurally: the scaling hooks measurably change the
computation the way reference mini_cpm4.py:304-391 describes.)
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu.models import dense
from nanovllm_tpu.ops.rope import longrope_attn_factor, rope_table


class MiniCPMConfig:
    architectures = ["MiniCPMForCausalLM"]
    model_type = "minicpm"
    vocab_size = 128
    hidden_size = 64
    intermediate_size = 128
    num_hidden_layers = 2
    num_attention_heads = 4
    num_key_value_heads = 2
    head_dim = 16
    max_position_embeddings = 128
    rope_theta = 10000.0
    rms_norm_eps = 1e-6
    tie_word_embeddings = True
    attention_bias = False
    scale_emb = 12.0
    scale_depth = 1.4
    dim_model_base = 32
    rope_scaling = None
    eos_token_id = 2


def test_spec_scaling_knobs():
    spec = dense.spec_from_hf(MiniCPMConfig(), max_model_len=128)
    assert spec.emb_scale == 12.0
    assert abs(spec.residual_scale - 1.4 / math.sqrt(2)) < 1e-9
    assert abs(spec.logit_scale - 1.0 / (64 / 32)) < 1e-9


def test_scaling_changes_logits():
    import jax

    cfg = MiniCPMConfig()
    spec = dense.spec_from_hf(cfg, max_model_len=128)
    plain = dense.DenseSpec(**{**spec.__dict__, "emb_scale": 1.0,
                               "residual_scale": 1.0, "logit_scale": 1.0})
    params = dense.init_params(plain, jax.random.key(0), dtype=jnp.float32)

    from nanovllm_tpu.ops.attention import KVCache
    from tests.test_tp import make_meta

    meta = make_meta(S=4, maxB=4, bs=16, chunk=16, ctx=16, n_seqs=1, T=16)
    ids = jnp.arange(16, dtype=jnp.int32) % 128

    def run(sp):
        cache = KVCache.zeros(2, 17, 16, sp.num_kv_heads, sp.head_dim,
                              jnp.float32)
        hidden, _ = dense.forward(sp, params, ids, meta, cache)
        return np.asarray(dense.compute_logits(sp, params, hidden))

    assert not np.allclose(run(spec), run(plain))


def test_longrope_tables():
    half = 8
    orig = 64
    scaling = {"rope_type": "longrope",
               "factor": [1.0 + 0.1 * i for i in range(half)],
               "attention_factor": longrope_attn_factor(
                   {"factor": 2.0, "original_max_position_embeddings": orig})}
    cos, sin = rope_table(16, 128, 10000.0, scaling)
    base_cos, _ = rope_table(16, 128, 10000.0, None)
    assert cos.shape == (128, half)
    # frequency rescaling + amplitude factor must actually alter the table
    assert not np.allclose(np.asarray(cos), np.asarray(base_cos))
    af = longrope_attn_factor({"factor": 2.0,
                               "original_max_position_embeddings": orig})
    assert abs(af - math.sqrt(1 + math.log(2.0) / math.log(orig))) < 1e-12
    assert abs(float(cos[0, 0]) - af) < 1e-6  # cos(0) * attention_factor


def test_minicpm_engine_e2e():
    from nanovllm_tpu import LLM, SamplingParams

    llm = LLM(MiniCPMConfig(), max_num_seqs=4, max_model_len=128,
              kvcache_block_size=16, num_kvcache_blocks=64,
              prefill_token_buckets=(64, 128), prefill_chunk=16,
              dtype="float32", attention_backend="jnp", warmup=False)
    rng = np.random.default_rng(0)
    out = llm.generate([list(rng.integers(1, 127, size=10))],
                       SamplingParams(temperature=0.0, max_tokens=5,
                                      ignore_eos=True), use_tqdm=False)
    assert len(out[0]["token_ids"]) == 5
