"""Pure-DMA microbench: replays the decode kernel's exact page access
pattern (per-seq grid, double-buffered PAGES_PER_ITER-page copies through
the block table) with NO compute — isolates the DMA-achievable bandwidth
from the kernel's compute/wait structure. If this lands near the chip peak
while the real kernel doesn't, the gap is exposed compute/wait time inside
the loop; if it lands at the kernel's number, the access pattern itself is
the bound.

Usage: python tools/bench_dma_only.py --S 192 --ctxs 1024
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--S", type=int, default=192)
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--row-dim", type=int, default=1024)
    p.add_argument("--layers", type=int, default=28)
    p.add_argument("--blocks", type=int, default=360)
    p.add_argument("--ctxs", default="1024")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--pages-per-iter", type=int, default=2)
    p.add_argument("--n-buf", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, bs, row_dim = args.S, args.bs, args.row_dim
    P, n_buf = args.pages_per_iter, args.n_buf
    L = 2

    def kernel(layer_ref, tables_ref, ctx_ref, kv_hbm, out_ref, kv_buf, sems):
        seq = pl.program_id(0)
        layer = layer_ref[0]
        ctx = ctx_ref[seq]
        npages = pl.cdiv(ctx, bs)
        niters = pl.cdiv(npages, P)

        def page_dmas(it, slot, do_start):
            base = it * P
            for pp in range(P):
                j = base + pp

                @pl.when(j < npages)
                def _():
                    page = tables_ref[seq, j]
                    c = pltpu.make_async_copy(
                        kv_hbm.at[layer, page], kv_buf.at[slot, pp],
                        sems.at[slot, pp])
                    (c.start if do_start else c.wait)()

        for it0 in range(n_buf - 1):
            @pl.when(it0 < niters)
            def _(it0=it0):
                page_dmas(it0, it0, True)

        def body(it, acc):
            slot = it % n_buf
            nxt = it + n_buf - 1

            @pl.when(nxt < niters)
            def _():
                page_dmas(nxt, nxt % n_buf, True)

            page_dmas(it, slot, False)
            # touch one row so the copies are not dead
            return acc + kv_buf[slot, 0, :1, :].astype(jnp.float32)

        acc = jax.lax.fori_loop(0, niters,
                                body, jnp.zeros((1, row_dim), jnp.float32))
        out_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, row_dim), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, P, 2 * bs, row_dim), jnp.int8),
            pltpu.SemaphoreType.DMA((n_buf, P)),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, 1, row_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))

    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.integers(-127, 127,
                                  (L, args.blocks, 2 * bs, row_dim),
                                  dtype=np.int8))

    @jax.jit
    def run(kv, tables, ctx):
        # Thread a dependency through the layer loop: otherwise the calls
        # are identical expressions and XLA CSEs 28 layers into L distinct
        # calls (first version measured an impossible 4 TB/s).
        out = jnp.zeros((), jnp.int32)
        for i in range(args.layers):
            # opaque dependency XLA cannot fold away
            layer = jnp.where(out < 0, out, i % L).reshape(1)
            r = call(layer, tables, ctx, kv)
            out = out + r[0, 0, 0].astype(jnp.int32) % 2
        return out

    for ctx_len in [int(x) for x in args.ctxs.split(",")]:
        npages = -(-ctx_len // bs)
        maxB = max(npages, 1)
        tables = np.zeros((S, maxB), np.int32)
        for i in range(S):
            tables[i, :npages] = (np.arange(npages) * S + i) % args.blocks
        tables = jnp.asarray(tables)
        ctx = jnp.full((S,), ctx_len, jnp.int32)
        out = run(kv, tables, ctx)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(kv, tables, ctx)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / args.iters
        bytes_moved = args.layers * S * npages * 2 * bs * row_dim
        print(f"[dma-only] ctx={ctx_len}: {dt*1e3:.2f} ms for {args.layers} "
              f"layers -> {bytes_moved/dt/2**30:.0f} GiB/s", flush=True)


if __name__ == "__main__":
    main()
