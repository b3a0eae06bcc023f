"""Head-to-head on-TPU bench: jax's ragged_paged_attention vs our decode
kernel, same data, same process (so tunnel variance cancels).

Decode workload: S=96 seqs, ctx=1024, page=256, 28 layer-calls per step.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.ragged_paged_attention import ragged_paged_attention

from nanovllm_tpu.ops.pallas.decode_attention import paged_decode_attention

S, bs, kvh, G, hd, L = 96, 256, 8, 2, 128, 28
QH = kvh * G
ctx_len = 1024
npages = ctx_len // bs
blocks = 400
maxB = 8

rng = np.random.default_rng(0)
tables = np.zeros((S, maxB), np.int32)
for i in range(S):
    tables[i, :npages] = (np.arange(npages) * S + i) % blocks
tables = jnp.asarray(tables)
ctx = jnp.full((S,), ctx_len, jnp.int32)
q = jnp.asarray(rng.standard_normal((S, QH, hd)).astype(np.float32)).astype(jnp.bfloat16)

# ours: stacked (L, NB, bs, kvh*hd)
k_st = jnp.asarray(rng.standard_normal((L, blocks, bs, kvh * hd)).astype(np.float32)).astype(jnp.bfloat16)
v_st = jnp.asarray(rng.standard_normal((L, blocks, bs, kvh * hd)).astype(np.float32)).astype(jnp.bfloat16)

# jax rpa: per-layer combined kv pages [NB, bs, 2*kvh, hd]
kv_layers = [
    jnp.asarray(rng.standard_normal((blocks, bs, 2 * kvh, hd)).astype(np.float32)).astype(jnp.bfloat16)
    for _ in range(4)  # reuse 4 distinct buffers to emulate 28 layers cheaply
]
cu_q = jnp.asarray(np.arange(S + 1, dtype=np.int32))  # 1 query per seq
nseqs = jnp.asarray([S], jnp.int32)


@jax.jit
def run_ours(q, k_st, v_st):
    out = q
    for i in range(L):
        out = paged_decode_attention(out, k_st, v_st, tables, ctx,
                                     i, scale=hd ** -0.5)
    return out


@jax.jit
def run_rpa(q, kv_layers):
    out = q
    for i in range(L):
        out = ragged_paged_attention(out, kv_layers[i % len(kv_layers)],
                                     ctx, tables, cu_q, nseqs,
                                     sm_scale=hd ** -0.5)
    return out


def timeit(f, *args, iters=10):
    out = f(*args)
    np.asarray(out)  # hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


kv_bytes = 2 * L * S * npages * bs * kvh * hd * 2
dt = timeit(run_ours, q, k_st, v_st)
print(f"ours: {dt*1e3:.2f} ms ({kv_bytes/dt/2**30:.0f} GiB/s)", flush=True)
dt = timeit(run_rpa, q, kv_layers)
print(f"jax rpa: {dt*1e3:.2f} ms ({kv_bytes/dt/2**30:.0f} GiB/s)", flush=True)
