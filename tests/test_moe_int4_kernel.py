"""Grouped int4 SwiGLU MLP kernel (ops/pallas/moe_int4.py): interpret-mode
parity against a straight-line reference that models the SAME arithmetic
(biased-nibble dequant, int8 activations, per-row h quantization)."""

import numpy as np

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.quant import quantize_int4_biased, unpack_int4_biased

L, E, D, I = 2, 8, 256, 256
RB_COUNTS = (3, 0, 5, 1, 0, 9, 2, 1)  # per-expert live rows, incl. empties


def _pack_stack(rng, shape):
    w = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.05
    return quantize_int4_biased(w)


def test_int4_grouped_mlp_matches_reference():
    from nanovllm_tpu.ops.pallas.moe_int4 import RB, int4_grouped_mlp

    rng = np.random.default_rng(0)
    w_gu, s_gu = _pack_stack(rng, (L, E, D, 2 * I))
    w_dn, s_dn = _pack_stack(rng, (L, E, I, D))
    layer = 1

    counts = np.asarray(RB_COUNTS, np.int32)
    aligned = -(-counts // 8) * 8
    cum = np.concatenate([[0], np.cumsum(aligned)]).astype(np.int32)
    R = int(cum[-1]) + RB  # read slack like the engine caller allocates

    x8 = np.zeros((R, D), np.int8)
    xs = np.ones((R, 128), np.float32)
    rows_of = []  # (row, expert)
    for e, c in enumerate(counts):
        for j in range(c):
            r = int(cum[e]) + j
            x8[r] = rng.integers(-127, 128, D)
            xs[r] = rng.uniform(0.01, 0.02)
            rows_of.append((r, e))

    out = int4_grouped_mlp(
        jnp.asarray(x8), jnp.asarray(xs), jnp.asarray(cum),
        w_gu, s_gu, w_dn, s_dn, layer, interpret=True)
    out = np.asarray(out, np.float32)

    # reference with identical arithmetic
    gu_f = np.asarray(unpack_int4_biased(w_gu[layer], s_gu[layer]))  # (E,D,2I)
    dn_f = np.asarray(unpack_int4_biased(w_dn[layer], s_dn[layer]))
    for r, e in rows_of:
        x = x8[r].astype(np.float32) * xs[r, 0]
        gu = x @ gu_f[e]
        h = gu[:I] / (1 + np.exp(-gu[:I])) * gu[I:]
        sh = max(np.abs(h).max(), 1e-8) / 127.0
        h8 = np.clip(np.round(h / sh), -127, 127)
        y = (h8 * sh) @ dn_f[e]
        np.testing.assert_allclose(out[r], y, rtol=2e-2, atol=2e-2)


def test_moe_block_pallas_path_matches_fallback(monkeypatch):
    """End-to-end moe_block: force the pallas branch (interpret) and check
    it agrees with the XLA chunked-dequant fallback within int8-activation
    noise."""
    from nanovllm_tpu.models import dense, moe

    base = dense.DenseSpec(
        vocab_size=64, hidden_size=D, num_layers=L, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate_size=2 * I,
        max_position_embeddings=64)
    spec = moe.MoESpec(base=base, num_experts=E, top_k=2,
                       moe_intermediate_size=I, norm_topk_prob=True)
    rng = np.random.default_rng(3)
    w_gu, s_gu = _pack_stack(rng, (L, E, D, 2 * I))
    w_dn, s_dn = _pack_stack(rng, (L, E, I, D))
    big = {"w_gate_up": w_gu, "w_gate_up_scale": s_gu,
           "w_down": w_dn, "w_down_scale": s_dn}
    lp = {"router": jnp.asarray(
        rng.standard_normal((D, E)).astype(np.float32)) * 0.1}
    x = jnp.asarray(rng.standard_normal((12, D)).astype(np.float32)) * 0.5

    want = np.asarray(moe.moe_block(spec, big, lp, x, 1))  # XLA fallback

    import nanovllm_tpu.ops.pallas.moe_int4 as mk

    orig = mk.int4_grouped_mlp
    monkeypatch.setattr(mk, "int4_grouped_mlp",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(moe, "_pallas_mlp_ok", lambda spec, big: True)
    got = np.asarray(moe.moe_block(spec, big, lp, x, 1))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.03 * scale, rtol=0.05)
