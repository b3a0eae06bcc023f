"""MiniCPM4 numerical parity against an independent float64 oracle.

The real MiniCPM4 HF implementation is trust_remote_code and unavailable
offline, so ground truth is re-derived here from the published architecture
(the semantics the reference implements in nanovllm/models/mini_cpm4.py:
scale_emb on embeddings :340-347, depth-scaled residuals scale_depth/sqrt(L)
:304-325, width-scaled logits hidden/(hidden_size/dim_model_base) :384-391,
LongRoPE short/long factor tables with the log-amplitude attention factor
:38-136). The oracle is written independently of the production code — plain
double-precision numpy, full-sequence causal attention, no paging, its own
rope derivation — so a transcription error in either implementation breaks
the comparison.

The engine side runs the REAL paths: spec_from_hf + the registry's LongRoPE
resolution + rope_table + dense.forward with paged KV prefill/decode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.engine.batch import prepare_batch
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models import dense
from nanovllm_tpu.models.registry import DenseAdapter
from nanovllm_tpu.ops.attention import AttnMeta, KVCache
from nanovllm_tpu.ops.rope import rope_table
from nanovllm_tpu.sampling_params import SamplingParams

BLOCK = 16
NBLOCKS = 64
MAXB = 8
S = 4
BUCKETS = (64, 128)


class MiniCPM4Config:
    """Duck-typed HF config for a tiny MiniCPM4."""

    architectures = ["MiniCPM4ForCausalLM"]
    model_type = "minicpm4"
    vocab_size = 96
    hidden_size = 64
    intermediate_size = 112
    num_hidden_layers = 3
    num_attention_heads = 4
    num_key_value_heads = 2
    head_dim = 16
    max_position_embeddings = 128
    rope_theta = 10000.0
    rms_norm_eps = 1e-6
    tie_word_embeddings = False
    attention_bias = False
    scale_emb = 12.0
    scale_depth = 1.4
    dim_model_base = 32
    eos_token_id = 2
    original_rope_window = 64  # helper, not an HF field

    def __init__(self, rope_scaling=None):
        self.rope_scaling = rope_scaling


def longrope_scaling():
    # Non-trivial factor tables (head_dim//2 = 8 entries each).
    rng = np.random.default_rng(11)
    return {
        "rope_type": "longrope",
        "short_factor": (1.0 + rng.random(8) * 0.5).tolist(),
        "long_factor": (2.0 + rng.random(8) * 2.0).tolist(),
        "original_max_position_embeddings": 64,
    }


# ---------------------------------------------------------------------------
# Independent float64 oracle
# ---------------------------------------------------------------------------

def _oracle_rope(cfg, max_model_len):
    """(cos, sin) tables, each (max_model_len, head_dim//2), float64 —
    derived directly from the LongRoPE definition."""
    half = cfg.head_dim // 2
    base_freq = 1.0 / (cfg.rope_theta ** (np.arange(half) / half))
    amp = 1.0
    if cfg.rope_scaling:
        orig = cfg.rope_scaling["original_max_position_embeddings"]
        if max_model_len > orig:
            factors = np.asarray(cfg.rope_scaling["long_factor"], np.float64)
            amp = np.sqrt(1.0 + np.log(max_model_len / orig) / np.log(orig))
        else:
            factors = np.asarray(cfg.rope_scaling["short_factor"], np.float64)
        base_freq = base_freq / factors
    angles = np.arange(max_model_len)[:, None] * base_freq[None, :]
    return np.cos(angles) * amp, np.sin(angles) * amp


def _rms(x, w, eps):
    v = x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps)
    return v * w


def _rotate(x, cos, sin):
    # NeoX half-split: x (T, H, hd); cos/sin (T, hd//2).
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c, s = cos[:, None, :], sin[:, None, :]
    return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def oracle_logits(cfg, w, token_ids, max_model_len):
    """Full-sequence forward; returns last-position logits (V,) float64."""
    ids = np.asarray(token_ids)
    T = len(ids)
    D, H, KV, hd = (cfg.hidden_size, cfg.num_attention_heads,
                    cfg.num_key_value_heads, cfg.head_dim)
    group = H // KV
    eps = cfg.rms_norm_eps
    rs = cfg.scale_depth / np.sqrt(cfg.num_hidden_layers)
    cos, sin = _oracle_rope(cfg, max_model_len)
    cos, sin = cos[:T], sin[:T]

    x = w["embed"][ids] * cfg.scale_emb
    causal = np.tril(np.ones((T, T), bool))
    for l in range(cfg.num_hidden_layers):
        n = _rms(x, w["ln1"][l], eps)
        qkv = n @ w["wqkv"][l]
        q = qkv[:, : H * hd].reshape(T, H, hd)
        k = qkv[:, H * hd: (H + KV) * hd].reshape(T, KV, hd)
        v = qkv[:, (H + KV) * hd:].reshape(T, KV, hd)
        q, k = _rotate(q, cos, sin), _rotate(k, cos, sin)
        outs = []
        for h in range(H):
            kh = k[:, h // group, :]
            vh = v[:, h // group, :]
            scores = (q[:, h, :] @ kh.T) / np.sqrt(hd)
            scores = np.where(causal, scores, -np.inf)
            p = np.exp(scores - scores.max(axis=-1, keepdims=True))
            p = p / p.sum(axis=-1, keepdims=True)
            outs.append(p @ vh)
        attn = np.concatenate(outs, axis=-1) @ w["wo"][l]
        x = x + attn * rs
        n = _rms(x, w["ln2"][l], eps)
        gu = n @ w["wgu"][l]
        I = cfg.intermediate_size
        g, u = gu[:, :I], gu[:, I:]
        mlp = ((g / (1.0 + np.exp(-g))) * u) @ w["wdown"][l]
        x = x + mlp * rs
    final = _rms(x[-1], w["final_ln"], eps)
    return (final @ w["lm_head"]) / (cfg.hidden_size / cfg.dim_model_base)


# ---------------------------------------------------------------------------
# Engine side
# ---------------------------------------------------------------------------

def make_weights(cfg, seed):
    rng = np.random.default_rng(seed)
    D, L, I = cfg.hidden_size, cfg.num_hidden_layers, cfg.intermediate_size
    qkv = (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * cfg.head_dim
    q_size = cfg.num_attention_heads * cfg.head_dim

    def rnd(*shape):
        return (rng.standard_normal(shape) * 0.05)

    return {
        "embed": rnd(cfg.vocab_size, D),
        "ln1": 1.0 + rnd(L, D) * 0.2,
        "ln2": 1.0 + rnd(L, D) * 0.2,
        "wqkv": rnd(L, D, qkv),
        "wo": rnd(L, q_size, D),
        "wgu": rnd(L, D, 2 * I),
        "wdown": rnd(L, I, D),
        "final_ln": 1.0 + rnd(D) * 0.2,
        "lm_head": rnd(D, cfg.vocab_size),
    }


def engine_params(spec, w, rope_scaling):
    cos, sin = rope_table(spec.head_dim, spec.max_position_embeddings,
                          spec.rope_theta, rope_scaling, dtype=jnp.float32)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return {
        "embed": f32(w["embed"]),
        "layers": {k: f32(w[k]) for k in
                   ("ln1", "ln2", "wqkv", "wo", "wgu", "wdown")},
        "final_ln": f32(w["final_ln"]),
        "lm_head": f32(w["lm_head"]),
        "rope_cos": cos,
        "rope_sin": sin,
    }


def engine_last_logits(spec, params, prompt, n_decode, next_tokens):
    """Real prefill + paged decode steps; returns last-position logits at
    each step (prefill, then each decode)."""
    bm = BlockManager(NBLOCKS - 1, BLOCK)
    seq = Sequence(list(prompt), SamplingParams(), block_size=BLOCK)
    bm.allocate(seq)
    cache = KVCache.zeros(spec.num_layers, NBLOCKS, BLOCK,
                          spec.num_kv_heads, spec.head_dim, jnp.float32)

    def step(batch, cache):
        meta = AttnMeta(
            seg_ids=jnp.asarray(batch.seg_ids),
            positions=jnp.asarray(batch.positions),
            slot_mapping=jnp.asarray(batch.slot_mapping),
            block_tables=jnp.asarray(batch.block_tables),
            context_lens=jnp.asarray(batch.context_lens),
            last_token_idx=jnp.asarray(batch.last_token_idx),
            chunk_seg=jnp.asarray(batch.chunk_seg),
            num_seqs=jnp.asarray(batch.num_seqs),
        )
        hidden, cache = dense.forward(
            spec, params, jnp.asarray(batch.input_ids), meta, cache)
        return np.asarray(dense.compute_logits(spec, params, hidden)), cache

    out = []
    kw = dict(block_size=BLOCK, dummy_slot=(NBLOCKS - 1) * BLOCK,
              max_num_seqs=S, blocks_per_seq=MAXB, token_buckets=BUCKETS,
              chunk=16)
    batch = prepare_batch([seq], True, **kw)
    logits, cache = step(batch, cache)
    out.append(logits[0])
    for d in range(n_decode):
        seq.append_token(int(next_tokens[d]))
        bm.append_slot(seq)
        batch = prepare_batch([seq], False, **kw)
        logits, cache = step(batch, cache)
        out.append(logits[0])
    return out


@pytest.mark.parametrize("scaling,max_model_len", [
    (None, 128),              # plain rope
    (longrope_scaling(), 48),  # short-factor table (within orig window)
    (longrope_scaling(), 128),  # long-factor table + log amplitude
])
def test_minicpm4_oracle_parity(scaling, max_model_len):
    cfg = MiniCPM4Config(rope_scaling=scaling)
    w = make_weights(cfg, seed=3)
    spec = dense.spec_from_hf(cfg, max_model_len=max_model_len)
    resolved = DenseAdapter._resolve_rope_scaling(cfg, max_model_len)
    params = engine_params(spec, w, resolved)

    # sanity: the MiniCPM knobs actually mapped into the spec
    assert spec.emb_scale == pytest.approx(12.0)
    assert spec.residual_scale == pytest.approx(1.4 / np.sqrt(3))
    assert spec.logit_scale == pytest.approx(32 / 64)

    rng = np.random.default_rng(7)
    prompt = rng.integers(1, cfg.vocab_size, size=21).tolist()
    n_decode = 4
    next_tokens = rng.integers(1, cfg.vocab_size, size=n_decode).tolist()

    got = engine_last_logits(spec, params, prompt, n_decode, next_tokens)
    seq = list(prompt)
    for i in range(n_decode + 1):
        want = oracle_logits(cfg, w, seq, max_model_len)
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)
        if i < n_decode:
            seq.append(next_tokens[i])


def test_minicpm4_greedy_generation_matches_oracle():
    """End-to-end LLM.generate greedy decode vs oracle greedy decode."""
    from nanovllm_tpu import LLM

    cfg = MiniCPM4Config(rope_scaling=longrope_scaling())
    llm = LLM(cfg, max_num_seqs=2, max_model_len=128, kvcache_block_size=16,
              num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
              prefill_chunk=16, dtype="float32", attention_backend="jnp",
              warmup=False)
    # Replace the random-init params with the oracle's weights.
    resolved = DenseAdapter._resolve_rope_scaling(cfg, 128)
    w = make_weights(cfg, seed=9)
    spec = llm.model_runner.adapter.spec
    llm.model_runner.params = engine_params(spec, w, resolved)

    rng = np.random.default_rng(13)
    prompt = rng.integers(1, cfg.vocab_size, size=18).tolist()
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True),
                       use_tqdm=False)[0]["token_ids"]

    seq = list(prompt)
    want = []
    for _ in range(6):
        nxt = int(np.argmax(oracle_logits(cfg, w, seq, 128)))
        want.append(nxt)
        seq.append(nxt)
    assert out == want
