"""Per-step dispatch floor: how much wall time does ONE jitted-step
round cost through this runtime (tunnel RPC + arg transfer + scheduling),
independent of any kernel work?

Times a chained trivial step (the token array feeds the next call, no host
read inside the loop) with the same host-side arg surface as the real
engine step (~10 small arrays re-transferred each call), then the same
with a host readback per step. The difference between the real decode step
time and (device work + this floor) is what kernel optimization can never
recover — it bounds tok/s at small batch.

    python tools/bench_dispatch.py --S 192 --iters 50
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--S", type=int, default=192)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    S = args.S
    rng = np.random.default_rng(0)
    host = {
        "input_ids": np.zeros(S, np.int32),
        "seg_ids": np.zeros(S, np.int32),
        "positions": np.zeros(S, np.int32),
        "slot_mapping": np.zeros(S, np.int32),
        "block_tables": np.zeros((S, 8), np.int32),
        "context_lens": np.ones(S, np.int32),
        "last_token_idx": np.zeros(S, np.int32),
        "chunk_seg": np.zeros(1, np.int32),
        "temperatures": np.ones(S, np.float32),
        "num_seqs": np.asarray(S, np.int32),
    }

    @jax.jit
    def step(dev, prev):
        # trivial device work touching every input
        acc = prev + dev["input_ids"] + dev["positions"]
        acc = acc + dev["block_tables"].sum(axis=1)
        return (acc + dev["context_lens"]) % 1000

    def put(h):
        return {k: jnp.asarray(v) for k, v in h.items()}

    tok = step(put(host), jnp.zeros(S, jnp.int32))
    np.asarray(tok)

    # chained: no host read inside the loop (the async-decode chain shape)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        tok = step(put(host), tok)
    np.asarray(tok)
    chained = (time.perf_counter() - t0) / args.iters
    print(f"chained trivial step: {chained*1e3:.2f} ms "
          f"(dispatch + H2D floor)", flush=True)

    # synchronous: read the tokens back every step (unchained engine shape)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        tok = step(put(host), tok)
        try:
            tok.copy_to_host_async()
        except Exception:
            pass
        tok_host = np.asarray(tok)
        tok = jnp.asarray(tok_host)
    sync = (time.perf_counter() - t0) / args.iters
    print(f"synchronous trivial step: {sync*1e3:.2f} ms "
          f"(+ D2H round trip)", flush=True)

    # host-side prep cost alone (no dispatch)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        put(host)
    prep = (time.perf_counter() - t0) / args.iters
    print(f"host put() alone: {prep*1e3:.2f} ms", flush=True)


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra_probes():
    import jax
    import jax.numpy as jnp

    S = 192
    host = {f"a{i}": np.zeros(S, np.int32) for i in range(10)}
    packed = np.zeros(10 * S, np.int32)

    @jax.jit
    def step10(dev, prev):
        acc = prev
        for v in dev.values():
            acc = acc + v
        return acc % 1000

    @jax.jit
    def step1(flat, prev):
        return (prev + flat.reshape(10, -1).sum(0)) % 1000

    def timeit(tag, fn, mk):
        tok = jnp.zeros(S, jnp.int32)
        tok = fn(*mk(), tok)
        np.asarray(tok)
        t0 = time.perf_counter()
        for _ in range(50):
            tok = fn(*mk(), tok)
        np.asarray(tok)
        dt = (time.perf_counter() - t0) / 50
        print(f"{tag}: {dt*1e3:.2f} ms", flush=True)

    timeit("chained, 10 args", step10,
           lambda: ({k: jnp.asarray(v) for k, v in host.items()},))
    timeit("chained, 1 packed arg", step1, lambda: (jnp.asarray(packed),))

    # big device work: does dispatch overlap execution?
    w = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8192, 8192)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def heavy(dev, w, prev):
        x = (prev.astype(jnp.bfloat16)[:, None] + w[:192]).astype(jnp.bfloat16)
        for _ in range(8):
            x = jnp.tanh(x @ w)
        acc = x[:, 0].astype(jnp.int32)
        for v in dev.values():
            acc = acc + v
        return acc % 1000

    tok = jnp.zeros(S, jnp.int32)
    tok = heavy({k: jnp.asarray(v) for k, v in host.items()}, w, tok)
    np.asarray(tok)
    t0 = time.perf_counter()
    for _ in range(20):
        tok = heavy({k: jnp.asarray(v) for k, v in host.items()}, w, tok)
    np.asarray(tok)
    dt = (time.perf_counter() - t0) / 20
    print(f"chained heavy step (8x 8k^3 matmul ~ 9 ms device): {dt*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__" and "--extra" in sys.argv:
    extra_probes()
