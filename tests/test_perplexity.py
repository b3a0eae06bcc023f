"""Quantization accuracy gate (BASELINE.json: delta perplexity vs BF16
<= 0.1). CI-runnable small-model version of tools/perplexity.py — the
deltas measure pure quantization error regardless of the (random) weights."""

import numpy as np

from transformers import Qwen3Config


def _tiny_cfg(seq_len):
    return Qwen3Config(
        vocab_size=512, hidden_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=256, max_position_embeddings=seq_len,
        architectures=["Qwen3ForCausalLM"])


def test_quant_ppl_delta_within_gate():
    import argparse

    from tools.perplexity import run_variant

    seq_len = 128
    args = argparse.Namespace(seq_len=seq_len, block_size=16, f32=True)
    rng = np.random.default_rng(0)
    streams = [list(rng.integers(1, 512, size=seq_len)) for _ in range(2)]
    cfg = _tiny_cfg(seq_len)
    ppl = {v: float(np.exp(run_variant(cfg, v, streams, args)))
           for v in ("bf16", "int8_kv", "int8_weights")}
    assert abs(ppl["int8_kv"] - ppl["bf16"]) <= 0.1, ppl
    assert abs(ppl["int8_weights"] - ppl["bf16"]) <= 0.1, ppl
