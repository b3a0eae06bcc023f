"""Microbenchmark of the engine's jitted step: isolates device step time from
host prep, for decode (S slots at a given context) and prefill (one bucket),
and reports roofline utilization (MFU + effective HBM bandwidth) against the
chip's published peaks. `--trace DIR` additionally captures a jax.profiler
trace of the timed loops for xprof/tensorboard.

Run on TPU:  python tools/profile_step.py [--backend pallas|jnp] [--trace DIR]
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
    parser.add_argument("--trace", default=None,
                        help="capture a jax.profiler trace into this dir")
    args = parser.parse_args()

    import jax

    from bench_model import qwen3_0_6b_config
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner, _fake_batch
    from nanovllm_tpu.utils import perf

    cfg = Config(model=qwen3_0_6b_config(), max_num_seqs=args.max_num_seqs,
                 max_model_len=2048, max_num_batched_tokens=4096,
                 kv_cache_dtype=args.kv_dtype,
                 attention_backend=args.backend)
    runner = ModelRunner(cfg)
    spec = runner.adapter.spec
    S = cfg.max_num_seqs
    bs = cfg.kvcache_block_size
    kv_itemsize = np.dtype(np.int8).itemsize \
        if runner.kv_dtype.__name__ == "int8" else 2
    w_itemsize = 1 if cfg.quantization == "int8" else 2
    dev = jax.local_devices()[0]
    pk_flops, pk_int8, pk_bw = perf.chip_peaks(dev)
    print(f"device {dev.device_kind}: peak {pk_flops/1e12:.0f} TFLOP/s bf16, "
          f"{pk_bw/2**30:.0f} GiB/s HBM")

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
    with perf.trace(args.trace):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            runner.run_batch(batch)
        dt = (time.perf_counter() - t0) / args.iters
    kv_bytes = perf.decode_kv_bytes(spec, S, ctx, kv_itemsize)
    w_bytes = perf.decode_weight_bytes(spec, w_itemsize)
    flops = perf.decode_step_flops(spec, S, ctx)
    print(f"decode S={S} ctx={ctx}: {dt*1e3:.2f} ms/step ({S/dt:.0f} tok/s)")
    print(f"  KV stream {kv_bytes/2**30:.2f} GiB -> {kv_bytes/dt/2**30:.0f} "
          f"GiB/s ({100*perf.hbm_frac(kv_bytes, dt, dev):.0f}% of HBM peak; "
          f"{100*perf.hbm_frac(kv_bytes + w_bytes, dt, dev):.0f}% incl. "
          f"weights)")
    print(f"  matmul {flops/1e9:.1f} GFLOP -> "
          f"{100*perf.mfu(flops, dt, dev):.1f}% MFU "
          f"(decode is bandwidth-bound; MFU is expected to be tiny)")

    # --- async-decode chain: device-resident token feed --------------------
    tok = runner.dispatch(batch)
    tok = runner.dispatch(batch, prev_tokens=tok,
                          gather_idx=np.zeros(S, np.int32))  # compile
    np.asarray(tok)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        tok = runner.dispatch(batch, prev_tokens=tok,
                              gather_idx=np.zeros(S, np.int32))
    np.asarray(tok)
    dt_chain = (time.perf_counter() - t0) / args.iters
    print(f"decode chained (no per-step host sync): {dt_chain*1e3:.2f} "
          f"ms/step ({S/dt_chain:.0f} tok/s) — host gap "
          f"{(dt - dt_chain)*1e3:.2f} ms hidden")

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
        with perf.trace(args.trace):
            t0 = time.perf_counter()
            for _ in range(5):
                runner.run_batch(fb)
            dt = (time.perf_counter() - t0) / 5
        flops = perf.prefill_flops(spec, T, avg_context=per // 2)
        print(f"prefill T={T}: {dt*1e3:.2f} ms ({T/dt:.0f} tok/s, "
              f"{100*perf.mfu(flops, dt, dev):.0f}% MFU)")


if __name__ == "__main__":
    main()
