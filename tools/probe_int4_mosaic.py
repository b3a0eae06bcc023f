"""Mosaic capability + speed probe for the int4 grouped-MLP kernel design:

  (a) native int8 nibble unpack (shifts on int8 vregs, 4 bytes/lane) vs the
      int32-container unpack quant.py uses (1 byte/lane);
  (b) int8 x int8 -> int32 MXU dot vs bf16 dot after conversion.

If (a)+(b) lower and run fast, a fused int4 expert-MLP kernel can stream
the 30B MoE's 14.5 GiB packed experts at DMA speed instead of paying a 3x
dequant-materialization amplification (or a 30+ ms VPU conversion).

    python tools/probe_int4_mosaic.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K2, N, T = 1024, 1536, 256  # one 30B gate_up expert: packed (1024, 1536)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-128, 128, (K2, N), dtype=np.int8))
    x8 = jnp.asarray(rng.integers(-127, 127, (T, 2 * K2), dtype=np.int8))
    xb = (x8.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)

    def timeit(tag, fn, *args, iters=50):
        try:
            out = fn(*args)
            _ = np.asarray(out).ravel()[:1]
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(out).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt*1e6:.0f} us", flush=True)
        return dt

    # --- (a) int8-native unpack + int8 MXU dot --------------------------
    def k_s8(x_ref, w_ref, o_ref):
        wb = w_ref[...]
        lo = (wb << 4) >> 4                       # int8 arithmetic shifts
        hi = wb >> 4
        a = jax.lax.dot_general(
            x_ref[:, :K2], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        b = jax.lax.dot_general(
            x_ref[:, K2:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = a + b

    call_s8 = pl.pallas_call(
        k_s8,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32))
    d_s8 = timeit("int8 unpack + s8s8s32 dot", jax.jit(call_s8), x8, w)

    # --- (b) int32-container unpack + bf16 dot (the quant.py path) ------
    def k_bf(x_ref, w_ref, o_ref):
        wi = w_ref[...].astype(jnp.int32)
        lo = ((wi << 28) >> 28).astype(jnp.bfloat16)
        hi = ((wi << 24) >> 28).astype(jnp.bfloat16)
        a = jax.lax.dot_general(
            x_ref[:, :K2], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b = jax.lax.dot_general(
            x_ref[:, K2:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = a + b

    call_bf = pl.pallas_call(
        k_bf,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32))
    d_bf = timeit("int32 unpack + bf16 dot", jax.jit(call_bf), xb, w)

    # --- (c) int8-native unpack + convert + bf16 dot ---------------------
    def k_mix(x_ref, w_ref, o_ref):
        wb = w_ref[...]
        lo = ((wb << 4) >> 4).astype(jnp.bfloat16)
        hi = (wb >> 4).astype(jnp.bfloat16)
        a = jax.lax.dot_general(
            x_ref[:, :K2], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b = jax.lax.dot_general(
            x_ref[:, K2:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = a + b

    call_mix = pl.pallas_call(
        k_mix,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32))
    timeit("int8 unpack + convert + bf16 dot", jax.jit(call_mix), xb, w)

    if d_s8:
        bytes_w = w.nbytes
        print(f"weight bytes {bytes_w/2**20:.1f} MiB; s8 path streams at "
              f"{bytes_w/d_s8/2**30:.0f} GiB/s-equivalent", flush=True)


if __name__ == "__main__":
    main()
