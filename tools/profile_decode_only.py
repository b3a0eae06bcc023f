"""Trace ONLY the chained decode step (the bench's steady state) so
trace_top_ops output isn't polluted by prefill executables.

Usage: python tools/profile_decode_only.py [--trace /tmp/dtrace]
       python tools/trace_top_ops.py /tmp/dtrace --top 30
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kv-dtype", default="int8")
    p.add_argument("--quantization", default="int8")
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--max-num-seqs", type=int, default=192)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", default="/tmp/dtrace")
    args = p.parse_args()

    import jax

    from bench_model import qwen3_0_6b_config
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner, _fake_batch

    cfg = Config(model=qwen3_0_6b_config(), max_num_seqs=args.max_num_seqs,
                 max_model_len=2048, max_num_batched_tokens=4096,
                 kv_cache_dtype=args.kv_dtype,
                 quantization=args.quantization or None)
    runner = ModelRunner(cfg)
    S = cfg.max_num_seqs
    bs = cfg.kvcache_block_size
    npages = -(-args.ctx // bs)
    batch = _fake_batch(cfg, runner.dummy_slot, S, phase="decode")
    tables = np.zeros((S, cfg.blocks_per_seq), np.int32)
    for i in range(S):
        tables[i, :npages] = (np.arange(npages) * S + i) % (runner.num_kvcache_blocks - 1)
    batch.block_tables[:] = tables
    batch.context_lens[:] = args.ctx
    batch.positions[:] = args.ctx - 1
    batch.num_seqs = S
    gidx = np.zeros(S, np.int32)

    tok = runner.dispatch(batch)
    tok = runner.dispatch(batch, prev_tokens=tok, gather_idx=gidx)
    np.asarray(tok)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace):
        for _ in range(args.iters):
            tok = runner.dispatch(batch, prev_tokens=tok, gather_idx=gidx)
        np.asarray(tok)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"chained decode: {dt*1e3:.2f} ms/step ({S/dt:.0f} tok/s); "
          f"trace in {args.trace}")


if __name__ == "__main__":
    main()
