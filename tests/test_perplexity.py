"""Quantization accuracy gate (BASELINE.json: delta perplexity vs BF16
<= 0.1). CI-runnable small-model version of tools/perplexity.py.

The gate is applied through the KL translation (tools/perplexity.py header):
on a random-weight model absolute delta-ppl is seed noise, but the mean
next-token KL(bf16 || variant) is the expected delta-NLL on data the bf16
model itself generates, so exp(KL) - 1 is the relative ppl increase. Gate:
KL <= ln(1.01) (delta-ppl 0.1 at ppl 10)."""

import numpy as np

from transformers import Qwen3Config


def _tiny_cfg(seq_len):
    return Qwen3Config(
        vocab_size=512, hidden_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=256, max_position_embeddings=seq_len,
        architectures=["Qwen3ForCausalLM"])


def test_quant_kl_within_gate():
    import argparse

    from tools.perplexity import KL_GATE, run_variant

    seq_len = 128
    args = argparse.Namespace(seq_len=seq_len, block_size=16, f32=True)
    rng = np.random.default_rng(0)
    streams = [list(rng.integers(1, 512, size=seq_len)) for _ in range(2)]
    cfg = _tiny_cfg(seq_len)
    _, _, ref_logits = run_variant(cfg, "bf16", streams, args)
    kl = {}
    for v in ("int8_kv", "int8_weights", "int4_weights"):
        _, kl[v], _ = run_variant(cfg, v, streams, args, ref_logits)
    assert kl["int8_kv"] <= KL_GATE, kl
    assert kl["int8_weights"] <= KL_GATE, kl
    assert kl["int4_weights"] <= KL_GATE, kl
