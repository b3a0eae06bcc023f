"""Microbenchmark: int8-KV *scale* write strategies on TPU.

Round-1 stored quant scales as (L, NB, 2*KVH, bs) and scattered one f32
per (token, head) into the minor (bs) axis — measured catastrophically slow
(engine decode 210 ms vs 56 ms bf16; the scatter rewrites a tile per
element). This bench times full 28-layer scan steps that scatter T tokens'
K/V rows (the known-fast baseline) plus scales under each candidate layout,
so the winner can be wired into ops/attention.write_kv.

Run on TPU: python tools/bench_scale_scatter.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

L, NB, BS, KVH, HD = 28, 700, 256, 8, 128
ROW = KVH * HD


def timeit(fn, args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def scan_over_layers(update):
    """Build a jitted fn: scan over L layers, scatter per layer (donated)."""

    def step(kv, sc, vals2, blocks2, rows2, sck, scv, blocks, offs):
        def body(carry, layer):
            kv, sc = carry
            kv = kv.at[layer, blocks2, rows2, :].set(vals2, mode="drop")
            sc = update(sc, layer, sck, scv, blocks, offs)
            return (kv, sc), None

        (kv, sc), _ = jax.lax.scan(
            body, (kv, sc), jnp.arange(L, dtype=jnp.int32))
        return kv, sc

    return jax.jit(step, donate_argnums=(0, 1))


def bench(name, sc_shape, sc_dtype, update, T):
    rng = np.random.default_rng(0)
    kv = jnp.zeros((L, NB, 2 * BS, ROW), jnp.int8)
    sc = jnp.zeros(sc_shape, sc_dtype)
    blocks = jnp.asarray(rng.permutation(NB - 1)[:T] if T <= NB - 1
                         else rng.integers(0, NB - 1, T), jnp.int32)
    offs = jnp.asarray(rng.integers(0, BS, T), jnp.int32)
    vals2 = jnp.asarray(rng.integers(-127, 127, (2 * T, ROW)), jnp.int8)
    blocks2 = jnp.concatenate([blocks, blocks])
    rows2 = jnp.concatenate([offs, BS + offs])
    sck = jnp.asarray(rng.random((T, KVH)), jnp.float32)
    scv = jnp.asarray(rng.random((T, KVH)), jnp.float32)
    fn = scan_over_layers(update)
    args = (kv, sc, vals2, blocks2, rows2, sck, scv, blocks, offs)
    dt = timeit(fn, args)
    print(f"  {name:28s} T={T:4d}: {dt*1e3:8.2f} ms/step")
    return dt


def values_only(T):
    return bench("values only (floor)", (1,), jnp.float32,
                 lambda sc, *a: sc, T)


def col_scatter(T):
    def upd(sc, layer, sck, scv, blocks, offs):
        sc = sc.at[layer, blocks, :KVH, offs].set(sck, mode="drop")
        return sc.at[layer, blocks, KVH:, offs].set(scv, mode="drop")

    return bench("col (round-1 layout)", (L, NB, 2 * KVH, BS), jnp.float32,
                 upd, T)


def row128(T, dtype, tag):
    def upd(sc, layer, sck, scv, blocks, offs):
        row = jnp.zeros((sck.shape[0], 128), dtype)
        row = jax.lax.dynamic_update_slice(row, sck.astype(dtype), (0, 0))
        row = jax.lax.dynamic_update_slice(row, scv.astype(dtype), (0, KVH))
        return sc.at[layer, blocks, offs].set(row, mode="drop")

    return bench(f"row128 {tag}", (L, NB, BS, 128), dtype, upd, T)


def page_gather_set(T):
    def upd(sc, layer, sck, scv, blocks, offs):
        pages = sc[layer, blocks]                      # (T, 2KVH, BS)
        new = jnp.concatenate([sck, scv], axis=1)      # (T, 2KVH)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (T, 1, BS), 2)
                == offs[:, None, None])
        pages = jnp.where(mask, new[:, :, None], pages)
        return sc.at[layer, blocks].set(pages, mode="drop")

    return bench("page gather+set (decode)", (L, NB, 2 * KVH, BS),
                 jnp.float32, upd, T)


def mul_add(T):
    def upd(sc, layer, sck, scv, blocks, offs):
        new = jnp.concatenate([sck, scv], axis=1)      # (T, 2KVH)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (T, 1, BS), 2)
                  == offs[:, None, None]).astype(jnp.float32)
        sc = sc.at[layer, blocks].mul(1.0 - onehot)
        return sc.at[layer, blocks].add(new[:, :, None] * onehot)

    return bench("page mul+add (general)", (L, NB, 2 * KVH, BS),
                 jnp.float32, upd, T)


def flat_window(T):
    def upd(sc, layer, sck, scv, blocks, offs):
        new = jnp.concatenate([sck, scv], axis=1)      # (T, 2KVH)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0, 1),
            scatter_dims_to_operand_dims=(0, 1, 2))
        idx = jnp.stack([jnp.full((T,), 0, jnp.int32) + layer, blocks,
                         offs * (2 * KVH)], axis=1)
        return jax.lax.scatter(
            sc, idx, new,
            dimension_numbers=jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0, 1),
                scatter_dims_to_operand_dims=(0, 1, 2)),
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)

    return bench("flat token-major window", (L, NB, BS * 2 * KVH),
                 jnp.float32, upd, T)


def main():
    dev = jax.local_devices()[0]
    print(f"device: {dev.device_kind}; L={L} NB={NB} bs={BS} KVH={KVH}")
    for T in (128, 512):
        values_only(T)
        col_scatter(T)
        row128(T, jnp.float32, "f32")
        row128(T, jnp.bfloat16, "bf16")
        page_gather_set(T)
        mul_add(T)
        try:
            flat_window(T)
        except Exception as e:  # scatter dnums can be finicky
            print(f"  flat token-major window: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
