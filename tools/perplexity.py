"""Quantization accuracy harness: teacher-forced perplexity of the same
token stream under bf16 / int8-KV / int8-weight configurations, reporting
the delta vs the bf16 baseline (BASELINE.json gate: delta ppl <= 0.1).

The reference has no quantization and no accuracy harness; this implements
the build-side north star (SURVEY §6). Without corpus/weights in this
environment it scores fixed-seed random token streams on a random-weight
model — absolute ppl is then meaningless, but the DELTA between variants is
exactly the quantization error, which is what the gate bounds. Pass --model
and --text-file for a real measurement.

Usage:
    python tools/perplexity.py [--model PATH] [--seq-len 512] [--n-seqs 4]
Prints one JSON line per variant plus a summary line.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def sequence_nll(adapter, params, cache, token_ids, block_size):
    """Mean next-token negative log-likelihood of one sequence, teacher
    forced: a single prefill whose `last_token_idx` selects EVERY position,
    so compute_logits yields (T, V)."""
    import jax
    import jax.numpy as jnp

    from nanovllm_tpu.ops import attention as attn_ops

    T = len(token_ids)
    npages = -(-T // block_size)
    table = np.arange(npages, dtype=np.int32)
    slots = (table[:, None] * block_size
             + np.arange(block_size)[None, :]).reshape(-1)[:T]
    meta = attn_ops.AttnMeta(
        seg_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.broadcast_to(jnp.asarray(table), (T, npages)),
        context_lens=jnp.full((T,), T, jnp.int32),
        last_token_idx=jnp.arange(T, dtype=jnp.int32),
        chunk_seg=jnp.zeros(max(T // block_size, 1), jnp.int32),
        num_seqs=jnp.asarray(1))
    ids = jnp.asarray(token_ids, dtype=jnp.int32)
    from nanovllm_tpu.models.dense import default_attn_fn

    hidden, cache = adapter.forward(params, ids, meta, cache,
                                    default_attn_fn)
    logits = adapter.compute_logits(params, hidden).astype(jnp.float32)
    logp = jnp.take_along_axis(jax.nn.log_softmax(logits[:-1], axis=-1),
                               ids[1:, None], axis=-1)
    return float(-jnp.mean(logp))


def run_variant(config_obj, variant, streams, args):
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.models.registry import get_adapter
    from nanovllm_tpu.ops.attention import KVCache

    import jax
    import jax.numpy as jnp

    cfg = Config(model=config_obj, max_model_len=args.seq_len,
                 kvcache_block_size=args.block_size)
    adapter = get_adapter(cfg)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    params = adapter.load_params(cfg.model_path, dtype, jax.random.key(0))
    if variant in ("int8_weights", "int4_weights"):
        from nanovllm_tpu.ops.quant import quantize_dense_params

        params = quantize_dense_params(
            params, bits=4 if variant == "int4_weights" else 8)
    npages = -(-args.seq_len // args.block_size)
    cache = KVCache.zeros(adapter.num_layers, npages + 1, args.block_size,
                          adapter.num_kv_heads, adapter.head_dim,
                          jnp.float32 if args.f32 else jnp.bfloat16,
                          quantized=(variant == "int8_kv"))
    nlls = [sequence_nll(adapter, params, cache, s, args.block_size)
            for s in streams]
    return float(np.mean(nlls))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="HF checkpoint (default: tiny random)")
    p.add_argument("--text-file", default=None, help="text to score (needs --model's tokenizer)")
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--n-seqs", type=int, default=4)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--f32", action="store_true", help="f32 compute (CPU parity runs)")
    p.add_argument("--variants",
               default="bf16,int8_kv,int8_weights,int4_weights")
    args = p.parse_args()

    if args.model:
        config_obj = args.model
        if args.text_file:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model)
            ids = tok.encode(open(args.text_file).read())
            streams = [ids[i: i + args.seq_len]
                       for i in range(0, max(len(ids) - args.seq_len, 1),
                                      args.seq_len)][: args.n_seqs]
        else:
            streams = None
    else:
        from transformers import Qwen3Config

        config_obj = Qwen3Config(
            vocab_size=512, hidden_size=128, num_hidden_layers=4,
            num_attention_heads=8, num_key_value_heads=4, head_dim=32,
            intermediate_size=256, max_position_embeddings=args.seq_len,
            architectures=["Qwen3ForCausalLM"])
        streams = None
    if streams is None:
        rng = np.random.default_rng(0)
        vocab = getattr(config_obj, "vocab_size", 32000) if not isinstance(
            config_obj, str) else 32000
        streams = [list(rng.integers(1, vocab, size=args.seq_len))
                   for _ in range(args.n_seqs)]

    results = {}
    for variant in args.variants.split(","):
        nll = run_variant(config_obj, variant, streams, args)
        results[variant] = {"nll": nll, "ppl": float(np.exp(nll))}
        print(json.dumps({"variant": variant, **results[variant]}),
              flush=True)
    base = results.get("bf16")
    summary = {"metric": "quant_ppl_delta"}
    for k, r in results.items():
        if base and k != "bf16":
            summary[f"delta_ppl_{k}"] = round(r["ppl"] - base["ppl"], 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
