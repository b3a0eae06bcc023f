"""Decode batch-size scaling sweep (the reference publishes bs16->256,
README.md:333-342): chained decode step latency and tok/s vs LIVE lanes,
with and without decode seq buckets — demonstrates what the bucket feature
buys in the run-tail / low-concurrency regime.

Run on TPU:  python tools/bench_decode_sweep.py [--family qwen3-0.6b]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_sweep(args, buckets_on: bool):
    import jax

    from bench import FAMILIES
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner, _fake_batch

    cfg = Config(model=FAMILIES[args.family](), max_num_seqs=args.max_num_seqs,
                 max_model_len=2048, max_num_batched_tokens=4096,
                 kv_cache_dtype="int8", quantization="int8",
                 decode_seq_buckets="auto" if buckets_on else ())
    runner = ModelRunner(cfg)
    bs = cfg.kvcache_block_size
    npages = -(-args.ctx // bs)
    rows = []
    for n in [int(x) for x in args.lanes.split(",")]:
        # pad to the bucket the engine would pick for n live lanes
        from nanovllm_tpu.engine.batch import pick_bucket
        S = pick_bucket(n, cfg.decode_seq_buckets)
        batch = _fake_batch(cfg, runner.dummy_slot, S, phase="decode",
                            seq_pad=S)
        tables = np.zeros((S, cfg.blocks_per_seq), np.int32)
        for i in range(n):
            tables[i, :npages] = (np.arange(npages) * n + i) \
                % (runner.num_kvcache_blocks - 1)
        batch.block_tables[:] = tables
        batch.context_lens[:n] = args.ctx
        batch.positions[:n] = args.ctx - 1
        batch.num_seqs = n
        gidx = np.zeros(S, np.int32)
        tok = runner.dispatch(batch)
        tok = runner.dispatch(batch, prev_tokens=tok, gather_idx=gidx)
        np.asarray(tok)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            tok = runner.dispatch(batch, prev_tokens=tok, gather_idx=gidx)
        np.asarray(tok)
        dt = (time.perf_counter() - t0) / args.iters
        rows.append((n, S, dt))
        print(f"[buckets={'on' if buckets_on else 'off'}] lanes={n:4d} "
              f"(padded {S:4d}): {dt*1e3:6.2f} ms/step, {n/dt:7.0f} tok/s",
              flush=True)
    del runner
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="qwen3-0.6b")
    p.add_argument("--lanes", default="16,32,48,64,96,128,192")
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--max-num-seqs", type=int, default=192)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--no-buckets", action="store_true",
                   help="sweep with bucketing disabled (pads to S_max); "
                        "run in a separate PROCESS from the bucketed sweep "
                        "(a second ModelRunner in one process OOMs on the "
                        "first one's still-allocated KV pool)")
    args = p.parse_args()

    run_sweep(args, buckets_on=not args.no_buckets)


if __name__ == "__main__":
    main()
