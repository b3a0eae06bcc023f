"""Fused-MLP kernel A/B: one Pallas call (gate_up matmul + silu + down
matmul, ops/pallas/quant_matmul.fused_mlp_int8_stacked) vs the unfused
stacked int8 chain, per family geometry, across token counts.

Answers two round-5 directives:
- VERDICT r4 #2: is the fused kernel a win at decode sizes, and how much?
- ADVICE r4 low: where is the prefill crossover? The fused grid
  (T/bt, n_i) re-streams the wgu+wdown stacks T/bt times per layer, so
  large-T prefill should favor the unfused chain (each weight streamed
  once).

    python tools/bench_fused_mlp.py --family qwen2-0.5b
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="qwen2-0.5b")
    p.add_argument("--T", type=int, nargs="*",
                   default=[24, 96, 192, 512, 2048])
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import FAMILIES
    from nanovllm_tpu.models.dense import spec_from_hf
    from nanovllm_tpu.ops.activation import silu_and_mul
    from nanovllm_tpu.ops.quant import fused_mlp, quant_matmul

    spec = spec_from_hf(FAMILIES[args.family]())
    L, D, I = spec.num_layers, spec.hidden_size, spec.intermediate_size
    rng = np.random.default_rng(0)
    wgu = jnp.asarray(rng.integers(-127, 127, (L, D, 2 * I), dtype=np.int8))
    sgu = jnp.asarray(rng.random((L, 2 * I), dtype=np.float32) * 0.01)
    wd = jnp.asarray(rng.integers(-127, 127, (L, I, D), dtype=np.int8))
    sd = jnp.asarray(rng.random((L, D), dtype=np.float32) * 0.01)
    mlp_bytes = wgu.nbytes + wd.nbytes

    def unfused(x):
        def body(h, layer):
            gu = quant_matmul(h, wgu, sgu, layer=layer)
            return quant_matmul(silu_and_mul(gu), wd, sd, layer=layer), None
        return jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))[0]

    def fused(x):
        def body(h, layer):
            out = fused_mlp(h, wgu, sgu, wd, sd, layer)
            assert out is not None, "geometry must tile for the A/B"
            return out, None
        return jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))[0]

    print(f"{args.family}: L={L} D={D} I={I} "
          f"(MLP weights {mlp_bytes / 2**20:.0f} MiB/layer-stack)")
    for T in args.T:
        x = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        row = [f"T={T:5d}"]
        for name, fn in (("unfused", unfused), ("fused", fused)):
            try:
                jfn = jax.jit(fn)
                out = jfn(x)
                np.asarray(out)  # parity guard value also forces compile
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = jfn(x)
                out.block_until_ready()
                dt = (time.perf_counter() - t0) / args.iters
                gibs = mlp_bytes / dt / 2**30
                row.append(f"{name} {dt * 1e3:7.2f} ms ({gibs:5.0f} GiB/s)")
            except Exception as e:
                row.append(f"{name} FAILED ({type(e).__name__})")
        print("  " + "  ".join(row), flush=True)


if __name__ == "__main__":
    main()
