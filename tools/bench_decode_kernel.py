"""Microbench of the paged decode attention kernel alone (no model), on TPU.

Times `layers` back-to-back kernel invocations (as the per-layer scan does)
for several context lengths and reports effective KV bandwidth against the
chip's ~800 GiB/s. Usage:
    python tools/bench_decode_kernel.py --dtype bf16
    python tools/bench_decode_kernel.py --dtype int8
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--S", type=int, default=96)
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--kvh", type=int, default=8)
    p.add_argument("--group", type=int, default=2)
    p.add_argument("--hd", type=int, default=128)
    p.add_argument("--layers", type=int, default=28)
    p.add_argument("--blocks", type=int, default=360)
    p.add_argument("--ctxs", default="256,1024,2048")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    p.add_argument("--pages-per-iter", type=int, default=2)
    p.add_argument("--n-buf", type=int, default=2)
    p.add_argument("--seq-group", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nanovllm_tpu.ops.attention import KVCache
    from nanovllm_tpu.ops.pallas.decode_attention import paged_decode_attention

    attn = paged_decode_attention

    S, bs, kvh, hd = args.S, args.bs, args.kvh, args.hd
    QH = kvh * args.group
    L = 2  # small stack; bandwidth behavior is per-page, layer count emulated
    maxB = 8
    rng = np.random.default_rng(0)
    vshape = (L, args.blocks, 2 * bs, kvh * hd)
    if args.dtype == "int8":
        cache = KVCache(
            jnp.asarray(rng.integers(-127, 127, vshape, dtype=np.int8)),
            jnp.asarray(rng.random((L, args.blocks, 2 * kvh, bs),
                                   dtype=np.float32) * 0.01))
        itemsize = 1
    else:
        cache = KVCache(jnp.asarray(
            rng.standard_normal(vshape).astype(np.float32)).astype(jnp.bfloat16))
        itemsize = 2
    q = jnp.asarray(rng.standard_normal((S, QH, hd)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    @jax.jit
    def run(q, cache, tables, ctx):
        out = q
        for i in range(args.layers):
            kw = {"pages_per_iter": args.pages_per_iter, "n_buf": args.n_buf,
                  "seq_group": args.seq_group}
            out = attn(out, cache, tables, ctx, i % L, scale=hd ** -0.5, **kw)
        return out

    for ctx_len in [int(x) for x in args.ctxs.split(",")]:
        npages = -(-ctx_len // bs)
        tables = np.zeros((S, maxB), np.int32)
        for i in range(S):
            tables[i, :npages] = (np.arange(npages) * S + i) % args.blocks
        tables = jnp.asarray(tables)
        ctx = jnp.full((S,), ctx_len, jnp.int32)
        # NOTE: block_until_ready does NOT synchronize through the axon
        # tunnel (measured: a 4x8192^3 matmul "completes" in 0.05 ms).
        # A tiny host readback is the only reliable fence.
        out = run(q, cache, tables, ctx)
        _ = np.asarray(out[0, 0, :1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(q, cache, tables, ctx)
        _ = np.asarray(out[0, 0, :1])
        dt = (time.perf_counter() - t0) / args.iters
        bytes_moved = 2 * args.layers * S * npages * bs * kvh * hd * itemsize
        per_iter = dt / (args.layers * S * max(npages // 2, 1)) * 1e6
        print(f"[{args.dtype}] ctx={ctx_len}: {dt*1e3:.2f} ms "
              f"for {args.layers} layers -> {bytes_moved/dt/2**30:.0f} GiB/s, "
              f"{per_iter:.1f} us/page-pair-iter", flush=True)


if __name__ == "__main__":
    main()
