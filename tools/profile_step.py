"""Microbenchmark of the engine's jitted step: isolates device step time from
host prep, for decode (S slots at a given context) and prefill (one bucket).

Run on TPU:  python tools/profile_step.py [--backend pallas|jnp]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default="pallas")
    parser.add_argument("--kv-dtype", default="auto")
    parser.add_argument("--ctx", type=int, default=1024)
    parser.add_argument("--max-num-seqs", type=int, default=96)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from bench_model import qwen3_0_6b_config
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner, _fake_batch

    cfg = Config(model=qwen3_0_6b_config(), max_num_seqs=args.max_num_seqs,
                 max_model_len=2048, max_num_batched_tokens=4096,
                 kv_cache_dtype=args.kv_dtype,
                 attention_backend=args.backend)
    runner = ModelRunner(cfg)
    S = cfg.max_num_seqs
    bs = cfg.kvcache_block_size

    # --- decode batch at fixed context -----------------------------------
    ctx = args.ctx
    npages = -(-ctx // bs)
    batch = _fake_batch(cfg, runner.dummy_slot, S, phase="decode")
    tables = np.zeros((S, cfg.blocks_per_seq), np.int32)
    for i in range(S):
        tables[i, :npages] = (np.arange(npages) * S + i) % (runner.num_kvcache_blocks - 1)
    batch.block_tables[:] = tables
    batch.context_lens[:] = ctx
    batch.positions[:] = ctx - 1
    batch.num_seqs = S

    runner.run_batch(batch)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        runner.run_batch(batch)
    dt = (time.perf_counter() - t0) / args.iters
    kv_bytes = 2 * 28 * ctx * 8 * 128 * 2 * S
    print(f"decode S={S} ctx={ctx}: {dt*1e3:.2f} ms/step "
          f"({S/dt:.0f} tok/s; KV {kv_bytes/2**30:.2f} GiB -> "
          f"{kv_bytes/dt/2**30:.0f} GiB/s)")

    # host-side prep cost
    from nanovllm_tpu.engine.batch import prepare_batch
    from nanovllm_tpu.engine.sequence import Sequence
    from nanovllm_tpu.sampling_params import SamplingParams

    seqs = []
    for i in range(S):
        s = Sequence(list(range(ctx)), SamplingParams(), block_size=bs)
        s.block_table = list(tables[i][:npages])
        seqs.append(s)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        prepare_batch(seqs, False, block_size=bs, dummy_slot=runner.dummy_slot,
                      max_num_seqs=S, blocks_per_seq=cfg.blocks_per_seq,
                      token_buckets=cfg.prefill_token_buckets)
    dt_h = (time.perf_counter() - t0) / args.iters
    print(f"host prepare_batch(decode): {dt_h*1e3:.2f} ms")

    # --- prefill bucket ---------------------------------------------------
    for T in cfg.prefill_token_buckets:
        fb = _fake_batch(cfg, runner.dummy_slot, T, phase="prefill")
        n = min(S, max(T // 512, 1))
        per = T // n
        for i in range(n):
            fb.seg_ids[i * per:(i + 1) * per] = i
            fb.positions[i * per:(i + 1) * per] = np.arange(per)
            fb.chunk_seg[i * per // cfg.prefill_chunk:(i + 1) * per // cfg.prefill_chunk] = i
            fb.context_lens[i] = per
            fb.block_tables[i, : per // bs + 1] = np.arange(per // bs + 1) * n + i
        runner.run_batch(fb)
        t0 = time.perf_counter()
        for _ in range(5):
            runner.run_batch(fb)
        dt = (time.perf_counter() - t0) / 5
        print(f"prefill T={T}: {dt*1e3:.2f} ms ({T/dt:.0f} tok/s)")


if __name__ == "__main__":
    main()
