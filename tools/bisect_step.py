"""Bisect the decode step: time the full jitted step vs the same step with
the attention call replaced by an identity (the KV write still runs) —
separates attention-kernel time from the rest (matmuls, norms, rope,
sampler, write_kv, dispatch overhead) without a profiler trace.

Run on TPU: python tools/bisect_step.py [--kv-dtype int8] [--ctx 1024]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="qwen3-0.6b")
    p.add_argument("--kv-dtype", default="int8")
    p.add_argument("--quantization", default=None)
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--max-num-seqs", type=int, default=160)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    import bench_model
    from bench import FAMILIES
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner, _fake_batch

    cfg = Config(model=FAMILIES[args.family](), max_num_seqs=args.max_num_seqs,
                 max_model_len=2048, max_num_batched_tokens=4096,
                 kv_cache_dtype=args.kv_dtype, quantization=args.quantization)
    runner = ModelRunner(cfg)
    S = cfg.max_num_seqs
    bs = cfg.kvcache_block_size
    npages = -(-args.ctx // bs)
    batch = _fake_batch(cfg, runner.dummy_slot, S, phase="decode")
    tables = np.zeros((S, cfg.blocks_per_seq), np.int32)
    for i in range(S):
        tables[i, :npages] = (np.arange(npages) * S + i) % (runner.num_kvcache_blocks - 1)
    batch.block_tables[:] = tables
    batch.context_lens[:] = args.ctx
    batch.positions[:] = args.ctx - 1
    batch.num_seqs = S

    def chain_time(tag):
        tok = runner.dispatch(batch)
        tok = runner.dispatch(batch, prev_tokens=tok,
                              gather_idx=np.zeros(S, np.int32))
        np.asarray(tok)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            tok = runner.dispatch(batch, prev_tokens=tok,
                                  gather_idx=np.zeros(S, np.int32))
        np.asarray(tok)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{tag}: {dt*1e3:.2f} ms/step ({S/dt:.0f} tok/s)")
        return dt

    import jax.numpy as jnp

    full = chain_time("full step")

    # Stub attention: identity on q (same shapes; KV write still happens in
    # the layer body before the attention call).
    def stub(q, cache, meta, scale, layer=None):
        return q.astype(jnp.bfloat16) if cache.quantized else q

    def rejit():
        from nanovllm_tpu.engine.model_runner import _STEP_STATICS

        runner._jit_step = jax.jit(
            runner._step, static_argnames=_STEP_STATICS,
            donate_argnums=(1,))

    runner._decode_attn = stub
    runner._prefill_attn = stub
    rejit()
    rest = chain_time("attention stubbed")

    # Additionally stub the KV write (cache returned unchanged).
    from nanovllm_tpu.ops import attention as attn_ops

    real_write = attn_ops.write_kv
    attn_ops.write_kv = lambda cache, k, v, slots, layer=None, unique=False: cache
    rejit()
    rest2 = chain_time("+ write_kv stubbed")

    # Additionally stub the sampler+logits (return argmax over hidden lanes).
    import nanovllm_tpu.engine.model_runner as mr

    real_sample = mr.sample_tokens
    mr.sample_tokens = lambda logits, temps, key: jnp.zeros(
        (logits.shape[0],), jnp.int32)
    real_logits = runner.adapter.compute_logits
    runner.adapter.compute_logits = (
        lambda params, hidden: hidden[:, :1024].astype(jnp.float32))
    rejit()
    rest3 = chain_time("+ lm_head/sampler stubbed")

    attn_ops.write_kv = real_write
    mr.sample_tokens = real_sample
    runner.adapter.compute_logits = real_logits
    print(f"attention {(full-rest)*1e3:.2f} ms | write_kv "
          f"{(rest-rest2)*1e3:.2f} ms | lm_head+sampler "
          f"{(rest2-rest3)*1e3:.2f} ms | core layers+dispatch "
          f"{rest3*1e3:.2f} ms")


if __name__ == "__main__":
    main()
