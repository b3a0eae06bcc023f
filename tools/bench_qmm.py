"""Microbench of the stacked quant matmuls at a model's decode geometry.

Times an L-layer chain of the four per-layer matmuls (wqkv, wo, wgu, wdown)
— the decode step's "core" minus attention/norms — for the pallas int8
stacked kernel at several (bk, bn) tilings, against the XLA bf16 chain
(the no-quant baseline) and the XLA int8-dequant chain. Identifies whether
the core floor is per-kernel overhead, tiling, or HBM.

    python tools/bench_qmm.py --family qwen2-0.5b --T 192
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="qwen2-0.5b")
    p.add_argument("--T", type=int, default=192)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import FAMILIES
    from nanovllm_tpu.models.dense import spec_from_hf
    from nanovllm_tpu.ops.pallas import quant_matmul as qmm

    spec = spec_from_hf(FAMILIES[args.family]())
    L, D, T = spec.num_layers, spec.hidden_size, args.T
    shapes = [("wqkv", D, spec.qkv_size), ("wo", spec.q_size, D),
              ("wgu", D, 2 * spec.intermediate_size),
              ("wdown", spec.intermediate_size, D)]
    rng = np.random.default_rng(0)
    ws = {n: (jnp.asarray(rng.integers(-127, 127, (L, K, N), dtype=np.int8)),
              jnp.asarray(rng.random((L, N), dtype=np.float32) * 0.01))
          for n, K, N in shapes}
    wbf = {n: (w.astype(jnp.bfloat16) * s[:, None, :]).astype(jnp.bfloat16)
           for n, (w, s) in ws.items()}
    total_bytes = sum(w.nbytes for w, _ in ws.values())
    x0 = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def adapt(h, K):
        """Shape h's columns to K keeping a data dependency (serializes the
        chain like the real layer dataflow does)."""
        if h.shape[1] == K:
            return h
        if h.shape[1] > K:
            return h[:, :K]
        reps = -(-K // h.shape[1])
        return jnp.tile(h, (1, reps))[:, :K]

    def chain(step):
        # weights ride as jit ARGUMENTS (capturing them as closure constants
        # embeds them in the HLO and the remote compile service rejects the
        # payload).
        def run(x, ws, wbf):
            def body(h, l):
                for n, K, N in shapes:
                    h = step(n, adapt(h, K), l, ws, wbf)
                return adapt(h, D), None
            h, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
            return h
        return jax.jit(run)

    def timeit(tag, fn):
        out = fn(x0, ws, wbf)
        _ = np.asarray(out[0, :1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(out, ws, wbf)
        _ = np.asarray(out[0, :1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{tag}: {dt*1e3:.2f} ms ({total_bytes/dt/2**30:.0f} GiB/s "
              f"weight stream)", flush=True)
        return dt

    # pallas stacked kernel at the default tiling
    def pallas_step(n, x, l, ws, wbf):
        w, s = ws[n]
        return qmm.int8_matmul_stacked(x, w, s, l)
    timeit("pallas int8 (default tiling)", chain(pallas_step))

    # pallas stacked kernel with the MLP fused into ONE call
    # (gate_up -> silu -> down; the baseline chain above omits the silu
    # pass entirely, so the fused win is understated here)
    def fused_run(x, ws, wbf):
        def body(h, l):
            for n, K, N in shapes[:2]:
                w, s = ws[n]
                h = qmm.int8_matmul_stacked(adapt(h, K), w, s, l)
            h = adapt(h, D)
            y = qmm.fused_mlp_int8_stacked(h, ws["wgu"][0], ws["wgu"][1],
                                           ws["wdown"][0], ws["wdown"][1], l)
            assert y is not None, "fused MLP tiles rejected this geometry"
            return adapt(y, D), None
        h, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return h
    try:
        timeit("pallas int8 + FUSED MLP (3 calls/layer)",
               jax.jit(fused_run))
    except Exception as e:
        print(f"fused MLP: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # pallas with explicit tilings
    for bk_cap, bn in ((512, 512), (512, 1024), (8192, 512), (8192, 1024)):
        def step(n, x, l, ws, wbf, bk_cap=bk_cap, bn_=bn):
            w, s = ws[n]
            Lw, K, N = w.shape
            bk = K if K <= bk_cap else qmm._pick_k_tile(K, bk_cap)
            if not bk or (bk % 128 and bk != K):
                bk = qmm._pick_k_tile(K)
            bn2 = bn_ if N >= bn_ else N
            kern = qmm._build_stacked(Lw, T, K, N, bk, bn2, "bfloat16",
                                      "bfloat16", False)
            return kern(jnp.asarray(l, jnp.int32).reshape(1), x, w,
                        s.reshape(Lw, 1, N))
        try:
            timeit(f"pallas int8 (bk<={bk_cap}, bn={bn})", chain(step))
        except Exception as e:
            print(f"pallas bk<={bk_cap} bn={bn}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # XLA bf16 (weights already dequantized; 2x the HBM bytes)
    def bf16_step(n, x, l, ws, wbf):
        return jnp.dot(x, wbf[n][l], preferred_element_type=jnp.float32
                       ).astype(x.dtype)
    timeit("XLA bf16 dot (2x bytes)", chain(bf16_step))

    # XLA int8 dequant-then-dot inside the scan
    def xla_q_step(n, x, l, ws, wbf):
        w, s = ws[n]
        y = jnp.dot(x, w[l].astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return (y * s[l]).astype(x.dtype)
    timeit("XLA int8 dequant+dot", chain(xla_q_step))


if __name__ == "__main__":
    main()
