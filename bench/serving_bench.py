"""Online serving benchmark: Poisson arrivals, TTFT / TPOT / latency.

Parity target: reference bench/serving_bench.py (same workload: default 256
requests at 8 req/s, input 100-1024, output 100-1024, temperature 0.6,
ignore_eos; same reported metrics). Uses the engine's built-in per-sequence
arrival/first-token timestamps instead of an external metrics table.
"""

import argparse
import json
import os
import sys
import time
from random import randint, seed

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    parser.add_argument("--num-requests", type=int, default=256)
    parser.add_argument("--request-rate", type=float, default=8.0)
    parser.add_argument("--max-input-len", type=int, default=1024)
    parser.add_argument("--max-output-len", type=int, default=1024)
    parser.add_argument("--max-num-seqs", type=int, default=160)
    parser.add_argument("--max-model-len", type=int, default=2048)
    parser.add_argument("--attention-backend", default="auto")
    parser.add_argument("--kv-cache-dtype", default="int8")
    parser.add_argument("--quantization", default="int8",
                        help="weight quantization (int8 matches bench.py's "
                             "offline default; 'none' for bf16 weights)")
    parser.add_argument("--prefill-step-tokens", type=int, default=2048,
                        help="prefill-token cap per mixed step: smaller = "
                             "shorter mixed steps = lower TPOT, more steps "
                             "per prompt = higher TTFT (VERDICT r4 #9 knob)")
    parser.add_argument("--smoke", action="store_true")
    args = parser.parse_args()

    seed(0)
    np.random.seed(0)
    if args.smoke:
        args.num_requests, args.max_input_len, args.max_output_len = 8, 64, 32
        args.request_rate = 16.0

    from nanovllm_tpu import LLM, SamplingParams

    if args.model is None:
        from bench_model import qwen3_0_6b_config  # noqa: shared with bench.py

        model = qwen3_0_6b_config()
        if args.smoke:
            from transformers import Qwen3Config

            model = Qwen3Config(
                vocab_size=8192, hidden_size=256, intermediate_size=768,
                num_hidden_layers=4, num_attention_heads=8,
                num_key_value_heads=4, head_dim=64,
                max_position_embeddings=2048, tie_word_embeddings=True,
                architectures=["Qwen3ForCausalLM"])
    else:
        model = args.model
    kw = {}
    if args.smoke:
        kw = dict(max_num_batched_tokens=512, prefill_token_buckets=(512,),
                  warmup=False, max_model_len=512, max_num_seqs=8)
    else:
        kw = dict(max_model_len=args.max_model_len,
                  max_num_seqs=args.max_num_seqs,
                  prefill_step_tokens=args.prefill_step_tokens)
    quant = None if args.quantization in (None, "none") else args.quantization
    llm = LLM(model, attention_backend=args.attention_backend,
              kv_cache_dtype=args.kv_cache_dtype, quantization=quant, **kw)
    # Serve only once FULLY warm: the background filtered-sampler compile
    # thread's tracing bursts hold the GIL and add ~9 ms to TPOT p50 if
    # left running under load.
    llm.wait_for_warmup()

    in_lo = min(100, max(args.max_input_len // 2, 1))
    out_lo = min(100, max(args.max_output_len // 2, 1))
    prompts = [[randint(0, 10000) for _ in range(randint(in_lo, args.max_input_len))]
               for _ in range(args.num_requests)]
    sps = [SamplingParams(temperature=0.6, ignore_eos=True,
                          max_tokens=randint(out_lo, args.max_output_len))
           for _ in range(args.num_requests)]
    arrival = np.cumsum(np.random.exponential(1.0 / args.request_rate,
                                              args.num_requests))

    seqs = {}
    completions = {}
    sent = 0
    t0 = time.perf_counter()
    while sent < len(prompts) or not llm.is_finished():
        now = time.perf_counter() - t0
        while sent < len(prompts) and now >= arrival[sent]:
            seq = llm.add_request(prompts[sent], sps[sent])
            seqs[seq.seq_id] = seq
            sent += 1
            now = time.perf_counter() - t0
        if llm.scheduler.num_waiting or llm.scheduler.num_running:
            outputs, _ = llm.step()
            done_t = time.perf_counter()
            for seq_id, token_ids, _, _ in outputs:
                completions[seq_id] = (done_t, len(token_ids))
        else:
            time.sleep(0.005)
    total_time = time.perf_counter() - t0

    ttfts, tpots, lats = [], [], []
    out_tokens = 0
    for seq_id, seq in seqs.items():
        done_t, out_len = completions[seq_id]
        out_tokens += out_len
        ttfts.append(seq.first_token_time - seq.arrival_time)
        lats.append(done_t - seq.arrival_time)
        if out_len > 1:
            tpots.append((done_t - seq.first_token_time) / (out_len - 1))

    def p(x, q):
        return float(np.percentile(x, q))

    print("--- Serving Benchmark Results ---", file=sys.stderr)
    print(f"Total time: {total_time:.2f}s  requests: {sent}  "
          f"output tokens: {out_tokens}", file=sys.stderr)
    print(f"Throughput: {out_tokens / total_time:.2f} tok/s", file=sys.stderr)
    print(f"TTFT  avg {np.mean(ttfts)*1e3:.1f} ms  p50 {p(ttfts,50)*1e3:.1f}  "
          f"p99 {p(ttfts,99)*1e3:.1f}", file=sys.stderr)
    print(f"TPOT  avg {np.mean(tpots)*1e3:.2f} ms  p50 {p(tpots,50)*1e3:.2f}  "
          f"p99 {p(tpots,99)*1e3:.2f}", file=sys.stderr)
    print(f"Latency avg {np.mean(lats):.2f} s", file=sys.stderr)
    print(json.dumps({
        "metric": "serving_p50_ttft_ms", "value": round(p(ttfts, 50) * 1e3, 2),
        "unit": "ms",
        "extra": {"p50_tpot_ms": round(p(tpots, 50) * 1e3, 3),
                  "throughput_tok_s": round(out_tokens / total_time, 2)},
    }))


if __name__ == "__main__":
    main()
