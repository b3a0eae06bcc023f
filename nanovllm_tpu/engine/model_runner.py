"""Per-host model executor: owns params + paged KV cache on device and runs
the whole engine step (embed -> layers -> sample) as ONE jitted function with
donated cache buffers.

Parity target: reference nanovllm/engine/model_runner.py — but where the
reference splits eager vs torchair-graph decode paths and spawns SHM-RPC
worker processes (model_runner.py:91-193, 376-396), here a single `jax.jit`
per batch shape covers everything: XLA replaces torchair, donation replaces
in-place cache mutation, the persistent compilation cache replaces
`.torchair_cache` (model_runner.py:129-154), and tensor parallelism is a
sharding annotation, not a process topology.
"""

from __future__ import annotations

import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.batch import (HostBatch, prepare_batch,
                                       prepare_chain_batch, prepare_plan)
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models.registry import get_adapter
from nanovllm_tpu.ops import attention as attn_ops
from nanovllm_tpu.ops.sampler import sample_tokens, sample_tokens_filtered

logger = logging.getLogger(__name__)

_DTYPES = {"auto": jnp.bfloat16, "bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "int8": jnp.int8}

_STEP_STATICS = ("phase", "T", "S", "C", "gather", "filtered_sampling")

_HBM_BYTES = {
    "TPU v4": 32 * 2**30,
    "TPU v5 lite": 16 * 2**30,
    "TPU v5e": 16 * 2**30,
    "TPU v5": 95 * 2**30,
    "TPU v5p": 95 * 2**30,
    "TPU v6 lite": 32 * 2**30,
    "TPU v6e": 32 * 2**30,
}


class ModelRunner:

    def __init__(self, config: Config, mesh=None):
        self.config = config
        if config.use_graph_cache and not config.enforce_eager:
            try:
                jax.config.update("jax_compilation_cache_dir", config.compile_cache_dir)
                # 0.0: persist EVERY executable. When the remote compile
                # service is warm, AOT warmup compiles return in <1s; with
                # the default 1.0s threshold they skip persistence and the
                # execute pass recompiles each shape all over again.
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            except Exception:  # cache knobs are best-effort across jax versions
                pass
        self.adapter = get_adapter(config)
        self.dtype = _DTYPES[config.dtype]
        self.kv_dtype = (self.dtype if config.kv_cache_dtype == "auto"
                         else _DTYPES.get(config.kv_cache_dtype, jnp.int8))

        # -- mesh (reference spawns per-rank worker processes over HCCL,
        # llm_engine.py:39-49 + model_runner.py:39; here TP is a device mesh
        # and the step runs SPMD under shard_map) --------------------------
        tp = config.tensor_parallel_size
        self.mesh = mesh
        if self.mesh is None and (tp > 1 or config.use_shard_map == "on"):
            from nanovllm_tpu.parallel import tp as tplib

            ndev = len(jax.devices())
            if ndev < tp:
                raise ValueError(
                    f"tensor_parallel_size={tp} but only {ndev} devices visible")
            self.mesh = tplib.make_mesh(tp)

        t0 = time.perf_counter()
        self.params = self.adapter.load_params(
            config.model_path, self.dtype, jax.random.key(config.seed))
        if config.quantization in ("int8", "int4"):
            from nanovllm_tpu.ops.quant import quantize_params

            # int4 row-parallel weights pack per TP shard block so the
            # PartitionSpec row split hands each shard a self-contained
            # pack (quant.quantize_weight_int4 row_shards); MoE expert
            # stacks quantize too at int4 (chunked in-step dequant).
            self.params = quantize_params(
                self.params, bits=4 if config.quantization == "int4" else 8,
                row_shards=tp)
        elif config.quantization:
            raise ValueError(f"unknown quantization {config.quantization!r}")
        self.params = jax.block_until_ready(self.params)
        logger.info("weights ready in %.1fs (quant=%s)",
                    time.perf_counter() - t0, config.quantization)

        # Cache geometry uses the GLOBAL adapter view; tp_plan below switches
        # the adapter spec to the per-shard view for the shard_map'ed step.
        self.num_kvcache_blocks = self._size_kv_cache()
        # Fused single-DMA layout (ops/attention.py KVCache): a page's K and
        # V rows are contiguous. The K/V planes are FOLDED into the row axis
        # — a separate size-2 axis gets tile-padded 2->4 by the scatter's
        # layout assignment and doubles the cache footprint (OOM on v5e).
        shape = (self.adapter.num_layers, self.num_kvcache_blocks,
                 2 * config.kvcache_block_size,
                 self.adapter.num_kv_heads * self.adapter.head_dim)
        sshape = (self.adapter.num_layers, self.num_kvcache_blocks,
                  2 * self.adapter.num_kv_heads, config.kvcache_block_size)
        kv_shardings = attn_ops.KVCache(None, None)
        self._kv_pspecs = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from nanovllm_tpu.parallel import tp as tplib

            self._kv_pspecs = tplib.kv_cache_pspec(self.kv_dtype == jnp.int8)
            kv_shardings = attn_ops.KVCache(*[
                NamedSharding(self.mesh, s) if s is not None else None
                for s in self._kv_pspecs])
        if self.kv_dtype == jnp.int8:
            self.cache = attn_ops.KVCache(
                jnp.zeros(shape, jnp.int8, device=kv_shardings.kv),
                jnp.zeros(sshape, jnp.float32, device=kv_shardings.scale))
        else:
            self.cache = attn_ops.KVCache(
                jnp.zeros(shape, self.kv_dtype, device=kv_shardings.kv))
        gib = sum(x.nbytes for x in jax.tree.leaves(self.cache)) / 2**30
        logger.info("KV cache (%s): %d blocks x %d tokens (%.2f GiB)",
                    self.kv_dtype.__name__, self.num_kvcache_blocks,
                    config.kvcache_block_size, gib)

        self.dummy_slot = (self.num_kvcache_blocks - 1) * config.kvcache_block_size
        # Host->device transfer for batch metadata: plain asarray on one
        # process; replicated global placement across hosts (the scheduler
        # is a replicated state machine, so every host passes identical
        # data — parallel/multihost.py).
        self._put = jnp.asarray
        if self.mesh is not None:
            from nanovllm_tpu.parallel import multihost

            self._put = multihost.replicate(self.mesh)
        self._prefill_attn, self._decode_attn = self._select_backends()
        if self.mesh is not None:
            self.params = self._shard_params(tp)
            self._jit_step = self._build_sharded_step()
        else:
            self._jit_step = jax.jit(
                self._step, static_argnames=_STEP_STATICS,
                donate_argnums=(1,))
        self._step_counter = 0

    def _shard_params(self, tp: int):
        """Host reorder + NamedSharding placement of the weight pytree
        (replaces the reference's per-class weight_loader shard slicing,
        linear.py:54-153)."""
        from nanovllm_tpu.parallel import multihost

        host = jax.tree.map(np.asarray, self.params)
        host, pspecs = self.adapter.tp_plan(host, tp)
        self._param_pspecs = pspecs
        put = multihost.shard_put(self.mesh)
        sharded = jax.tree.map(put, host, pspecs)
        if getattr(self.adapter, "params", None) is not None:
            self.adapter.params = sharded  # vision encoders read from here
        return sharded

    def _build_sharded_step(self):
        """jit(shard_map(step)): params/cache sharded by their pspecs, batch
        metadata replicated, sampled tokens replicated (every shard computes
        the identical sample — the SPMD analogue of the reference's
        rank-0-only sampler, model_runner.py:440-450)."""
        from jax.sharding import PartitionSpec as P

        rep = P()

        def sharded(params, cache, flat, prev_tokens, extras, *, phase,
                    T, S, C, gather="none", filtered_sampling=False):
            fn = partial(self._step, phase=phase, T=T, S=S, C=C,
                         gather=gather, filtered_sampling=filtered_sampling)
            return jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(self._param_pspecs, self._kv_pspecs, rep, rep, rep),
                out_specs=(self._kv_pspecs, rep),
                check_vma=False,
            )(params, cache, flat, prev_tokens, extras)

        return jax.jit(sharded, static_argnames=_STEP_STATICS,
                       donate_argnums=(1,))

    # -- setup ------------------------------------------------------------
    def _size_kv_cache(self) -> int:
        cfg = self.config
        shards = self.mesh.devices.size if self.mesh is not None else 1
        itemsize = jnp.dtype(self.kv_dtype).itemsize
        per_token = self.adapter.num_kv_heads * self.adapter.head_dim * itemsize
        if self.kv_dtype == jnp.int8:
            per_token += self.adapter.num_kv_heads * 4  # f32 scales
        block_bytes = (self.adapter.num_layers * 2 * cfg.kvcache_block_size
                       * per_token)
        if cfg.num_kvcache_blocks > 0:
            return cfg.num_kvcache_blocks
        dev = jax.local_devices()[0]
        free = 0
        try:
            stats = dev.memory_stats() or {}
            if stats.get("bytes_limit"):
                free = stats["bytes_limit"] * cfg.gpu_memory_utilization \
                    - stats["bytes_in_use"]
        except Exception:
            pass
        if free <= 0 and dev.platform == "tpu":
            # memory_stats() is unavailable on some TPU runtimes: fall back to
            # the known HBM size per device kind minus what we already placed.
            # Params end up 1/shards per device once sharded.
            hbm = _HBM_BYTES.get(dev.device_kind, 16 * 2**30)
            params_bytes = sum(x.nbytes for x in jax.tree.leaves(self.params))
            free = hbm * cfg.gpu_memory_utilization - params_bytes / shards
        if free <= 0:
            n = 512  # CPU / unknown backend: small fixed pool
        else:
            # The cache shards its kv-head/feature axis: each device holds
            # block_bytes/shards per block, so the pool scales with the mesh.
            n = int(free * shards // block_bytes)
        n = max(n, self.config.blocks_per_seq + 1)
        return n

    def _select_backends(self):
        backend = self.config.attention_backend
        if backend == "auto":
            platform = jax.local_devices()[0].platform
            backend = "pallas" if platform == "tpu" else "jnp"
        if backend == "pallas":
            try:
                from nanovllm_tpu.ops.pallas import backends as pallas_backends

                return pallas_backends.get_attention_fns(self.config)
            except ImportError:
                logger.warning("pallas backend unavailable; using jnp")
                backend = "jnp"
        if backend == "jnp":
            chunk = self.config.prefill_chunk

            def prefill(q, cache, meta, scale, layer=None):
                return attn_ops.ragged_prefill_attention_jnp(
                    q, cache, meta, scale, chunk, layer=layer)

            def decode(q, cache, meta, scale, layer=None):
                return attn_ops.paged_decode_attention_jnp(
                    q, cache, meta.block_tables, meta.context_lens, scale,
                    layer=layer)

            return prefill, decode
        if backend == "reference":
            return (attn_ops.ragged_attention_reference,
                    attn_ops.ragged_attention_reference)
        raise ValueError(f"unknown attention backend {backend!r}")

    # -- the jitted step ---------------------------------------------------
    def _store_attn_fn(self, phase):
        """Per-phase store+attend closure with the unified model-side
        interface `(q, k, v, cache, meta, scale, layer, kv_mode) ->
        (out, cache)` — the backend owns the KV write. (An in-kernel fused
        row write was built and abandoned: Mosaic cannot DMA single rows
        into the tiled HBM cache, and an 8-row read-modify-write costs more
        in per-program waits than the ~1.4 ms XLA scatter it replaces —
        BUILD_NOTES round 3.) Mixed steps run the decode region first,
        then the prefill write + kernel."""
        chunk = self.config.prefill_chunk
        aligned = self.config.kvcache_block_size % chunk == 0

        def write_prefill(cache, k, v, slots, layer):
            if aligned:
                return attn_ops.write_kv_chunks(cache, k, v, slots, chunk,
                                                layer)
            return attn_ops.write_kv(cache, k, v, slots, layer)

        def decode_part(q, k, v, cache, meta, scale, layer):
            cache = attn_ops.write_kv(cache, k, v, meta.slot_mapping, layer,
                                      unique=True)
            return self._decode_attn(q, cache, meta, scale, layer), cache

        if phase == "decode":
            def fn(q, k, v, cache, meta, scale, layer, kv_mode):
                return decode_part(q, k, v, cache, meta, scale, layer)
        elif phase == "prefill":
            def fn(q, k, v, cache, meta, scale, layer, kv_mode):
                cache = write_prefill(cache, k, v, meta.slot_mapping, layer)
                out = self._prefill_attn(q, cache, meta, scale, layer)
                return out, cache
        else:  # mixed: token axis is [prefill region | S decode rows]
            def fn(q, k, v, cache, meta, scale, layer, kv_mode):
                S = meta.context_lens.shape[0]
                Tp = q.shape[0] - S
                md = meta._replace(
                    seg_ids=meta.seg_ids[Tp:], positions=meta.positions[Tp:],
                    slot_mapping=meta.slot_mapping[Tp:],
                    context_lens=meta.decode_context_lens,
                    decode_context_lens=None)
                out_d, cache = decode_part(q[Tp:], k[Tp:], v[Tp:], cache,
                                           md, scale, layer)
                mp = meta._replace(
                    seg_ids=meta.seg_ids[:Tp], positions=meta.positions[:Tp],
                    slot_mapping=meta.slot_mapping[:Tp],
                    decode_context_lens=None)
                cache = write_prefill(cache, k[:Tp], v[:Tp],
                                      mp.slot_mapping, layer)
                out_p = self._prefill_attn(q[:Tp], cache, mp, scale, layer)
                return jnp.concatenate([out_p, out_d], axis=0), cache

        return fn

    def _unpack(self, flat, *, T, S, C, phase, gather, filtered):
        """Split the single packed int32 batch array back into named fields.

        ONE H2D argument instead of ~10: this runtime's dispatch cost is
        ~0.5 ms PER ARGUMENT (tools/bench_dispatch.py: 10 args 5.76 ms vs
        1 packed arg 1.31 ms), which was ~30%% of the Qwen2 decode step.
        All offsets are static (shapes are jit constants)."""
        B = self.config.blocks_per_seq
        off = 0

        def take(n):
            nonlocal off
            a = flat[off: off + n]
            off += n
            return a

        dev = {
            "input_ids": take(T),
            "seg_ids": take(T),
            "positions": take(T),
            "slot_mapping": take(T),
            "context_lens": take(S),
            "last_token_idx": take(S),
            "temperatures": jax.lax.bitcast_convert_type(take(S), jnp.float32),
            "chunk_seg": take(C),
            "num_seqs": take(1)[0],
            "block_tables": take(S * B).reshape(S, B),
        }
        if phase == "mixed":
            dev["decode_ctx"] = take(S)
        if gather == "hybrid":
            dev["gather_idx"] = take(T)
        elif gather == "pure":
            dev["gather_idx"] = take(S)
        if filtered:
            dev["top_k"] = take(S)
            dev["top_p"] = jax.lax.bitcast_convert_type(take(S), jnp.float32)
        dev["step_idx"] = jax.lax.bitcast_convert_type(take(1), jnp.uint32)[0]
        return dev

    def _step(self, params, cache, flat, prev_tokens, extras, *, phase,
              T, S, C, gather="none", filtered_sampling=False):
        dev = self._unpack(flat, T=T, S=S, C=C, phase=phase, gather=gather,
                           filtered=filtered_sampling)
        step_idx = dev.pop("step_idx")
        meta = attn_ops.AttnMeta(
            seg_ids=dev["seg_ids"], positions=dev["positions"],
            slot_mapping=dev["slot_mapping"], block_tables=dev["block_tables"],
            context_lens=dev["context_lens"], last_token_idx=dev["last_token_idx"],
            chunk_seg=dev["chunk_seg"], num_seqs=dev["num_seqs"],
            decode_context_lens=dev.get("decode_ctx"))
        attn_fn = self._store_attn_fn(phase)
        if extras is not None:
            dev["extras"] = extras
        if prev_tokens is not None:
            # Async chain: inputs that depend on the in-flight step's samples
            # are gathered from its device token array. Pure-decode chains
            # replace ALL inputs; hybrid (mixed/prefill-ahead) chains gather
            # only the virtual decode rows (gather_idx >= 0) and keep host
            # ids (prompt tokens) elsewhere.
            prev = prev_tokens
            gidx = dev.pop("gather_idx")
            if gather == "hybrid":
                gathered = prev[jnp.clip(gidx, 0, prev.shape[0] - 1)]
                dev["input_ids"] = jnp.where(gidx >= 0, gathered,
                                             dev["input_ids"])
            else:
                dev["input_ids"] = prev[gidx]
        # KV-write strategy is static per phase: decode writes one distinct
        # page per live lane (single-pass scale update); prefill's
        # chunk-aligned layout allows whole-chunk dynamic_update_slices
        # when the chunk divides the page (attn_ops.write_kv_mode).
        aligned = self.config.kvcache_block_size % self.config.prefill_chunk == 0
        kv_mode = {"decode": "unique",
                   "prefill": "chunks" if aligned else "scatter",
                   "mixed": "mixed" if aligned else "scatter"}[phase]
        if "extras" in dev:
            hidden, cache = self.adapter.forward(
                params, dev["input_ids"], meta, cache, attn_fn,
                extras=dev["extras"], kv_mode=kv_mode)
        else:
            hidden, cache = self.adapter.forward(
                params, dev["input_ids"], meta, cache, attn_fn,
                kv_mode=kv_mode)
        logits = self.adapter.compute_logits(params, hidden)
        key = jax.random.fold_in(jax.random.key(self.config.seed), step_idx)
        if filtered_sampling:
            tokens = sample_tokens_filtered(
                logits, dev["temperatures"], dev["top_k"], dev["top_p"], key)
        else:
            tokens = sample_tokens(logits, dev["temperatures"], key)
        # Uniform token-array shape across decode seq buckets: the async
        # chain gathers from the PREVIOUS step's output, so a bucketed
        # (S_pad,) output would fork the chain compile per (cur, prev)
        # bucket pair. Padding to max_num_seqs is a few hundred bytes.
        if tokens.shape[0] < self.config.max_num_seqs:
            tokens = jnp.pad(
                tokens, (0, self.config.max_num_seqs - tokens.shape[0]))
        return cache, tokens

    # -- public API --------------------------------------------------------
    def run(self, seqs: list[Sequence], is_prefill: bool) -> list[int]:
        batch = self.prepare(seqs, is_prefill)
        extras = None
        if hasattr(self.adapter, "prepare_extras"):
            extras = self.adapter.prepare_extras(seqs, batch)
        return self.run_batch(batch, extras)

    def run_plan(self, plan) -> list[int]:
        batch, tokens = self.dispatch_plan(plan)
        return np.asarray(tokens)[: batch.num_seqs].tolist()

    def dispatch_plan(self, plan):
        """Enqueue a StepPlan; returns (HostBatch, device token array)."""
        cfg = self.config
        batch = prepare_plan(
            plan,
            block_size=cfg.kvcache_block_size,
            dummy_slot=self.dummy_slot,
            max_num_seqs=cfg.max_num_seqs,
            blocks_per_seq=cfg.blocks_per_seq,
            token_buckets=cfg.prefill_token_buckets,
            chunk=cfg.prefill_chunk,
            seq_buckets=cfg.decode_seq_buckets,
        )
        extras = None
        if hasattr(self.adapter, "prepare_extras"):
            # Mixed plans have batch.is_prefill=False; the adapter must
            # still treat the first len(plan.prefill) slots as prefill
            # windows (vision slices + windowed mrope), not decode lanes.
            extras = self.adapter.prepare_extras(plan.seqs, batch,
                                                 n_prefill=len(plan.prefill))
        return batch, self.dispatch(batch, extras)

    def dispatch_plan_ahead(self, plan, gather_src, prev_tokens):
        """Dispatch the step AFTER the in-flight one (scheduler.
        schedule_plan_ahead): window continuations and admissions carry
        host-known prompt ids; virtual decode lanes gather their input from
        `prev_tokens` (the in-flight step's device samples) in-jit. When no
        lane is virtual the batch dispatches through the PLAIN path — same
        jit signature, no extra compilation."""
        cfg = self.config
        batch = prepare_plan(
            plan,
            block_size=cfg.kvcache_block_size,
            dummy_slot=self.dummy_slot,
            max_num_seqs=cfg.max_num_seqs,
            blocks_per_seq=cfg.blocks_per_seq,
            token_buckets=cfg.prefill_token_buckets,
            chunk=cfg.prefill_chunk,
            virtual_lanes=gather_src,
            seq_buckets=cfg.decode_seq_buckets,
        )
        extras = None
        if hasattr(self.adapter, "prepare_extras"):
            extras = self.adapter.prepare_extras(plan.seqs, batch,
                                                 n_prefill=len(plan.prefill))
        if batch.gather_idx is None or not (batch.gather_idx >= 0).any():
            batch.gather_idx = None  # plain signature
            return batch, self.dispatch(batch, extras)
        return batch, self.dispatch(batch, extras, prev_tokens=prev_tokens)

    def dispatch_chain(self, seqs, prev_tokens, gather_idx):
        """Async-decode chain step: a pure-decode batch at each sequence's
        virtual length len+1 whose input tokens are `prev_tokens` (the
        in-flight step's device samples) gathered by `gather_idx`."""
        cfg = self.config
        batch = prepare_chain_batch(
            seqs,
            block_size=cfg.kvcache_block_size,
            dummy_slot=self.dummy_slot,
            max_num_seqs=cfg.max_num_seqs,
            blocks_per_seq=cfg.blocks_per_seq,
            chunk=cfg.prefill_chunk,
            seq_buckets=cfg.decode_seq_buckets,
        )
        # gather_idx rides the (bucketed) token axis of THIS batch.
        S = batch.input_ids.shape[0]
        if gather_idx.shape[0] != S:
            gather_idx = np.zeros(S, np.int32) if gather_idx.shape[0] < S \
                else gather_idx[:S]
        extras = None
        if hasattr(self.adapter, "prepare_extras"):
            # Multimodal chain: decode mrope positions are deterministic in
            # the virtual length the batch already carries (n_prefill=0:
            # every lane is a decode lane).
            extras = self.adapter.prepare_extras(seqs, batch, n_prefill=0)
        return batch, self.dispatch(batch, extras, prev_tokens=prev_tokens,
                                    gather_idx=gather_idx)

    def prepare(self, seqs: list[Sequence], is_prefill: bool) -> HostBatch:
        cfg = self.config
        return prepare_batch(
            seqs, is_prefill,
            block_size=cfg.kvcache_block_size,
            dummy_slot=self.dummy_slot,
            max_num_seqs=cfg.max_num_seqs,
            blocks_per_seq=cfg.blocks_per_seq,
            token_buckets=cfg.prefill_token_buckets,
            chunk=cfg.prefill_chunk,
        )

    def run_batch(self, batch: HostBatch, extras=None) -> list[int]:
        tokens = self.dispatch(batch, extras)
        return np.asarray(tokens)[: batch.num_seqs].tolist()

    def _pack_args(self, batch: HostBatch, extras=None, prev_tokens=None,
                   gather_idx=None):
        """Pack one step's metadata: returns ((flat_dev, prev_tokens,
        dev_extras), statics) — the argument tail + static kwargs of
        `_jit_step(params, cache, *tail, **statics)`. Shared by the real
        dispatch path and the AOT warmup lowering (which substitutes
        ShapeDtypeStructs for params/cache/prev_tokens)."""
        if extras is None and hasattr(self.adapter, "prepare_extras"):
            extras = self.adapter.prepare_extras(None, batch)
        put = self._put
        phase = batch.phase or ("prefill" if batch.is_prefill else "decode")
        assert (batch.decode_ctx is not None) == (phase == "mixed")
        filtered = bool((batch.top_k[: batch.num_seqs] > 0).any()
                        or (batch.top_p[: batch.num_seqs] < 1.0).any())
        gather = "none"
        parts = [
            batch.input_ids, batch.seg_ids, batch.positions,
            batch.slot_mapping, batch.context_lens, batch.last_token_idx,
            batch.temperatures.view(np.int32), batch.chunk_seg,
            np.asarray([batch.num_seqs], dtype=np.int32),
            np.ascontiguousarray(batch.block_tables).reshape(-1),
        ]
        if phase == "mixed":
            parts.append(batch.decode_ctx)
        if prev_tokens is not None:
            if batch.gather_idx is not None:
                # Hybrid chain (mixed/prefill-ahead): host ids for prompt
                # rows, device gather for virtual decode rows.
                gather = "hybrid"
                parts.append(batch.gather_idx)
            else:
                gather = "pure"
                parts.append(gather_idx)
        if filtered:
            parts += [batch.top_k, batch.top_p.view(np.int32)]
        self._step_counter += 1
        parts.append(np.asarray([self._step_counter],
                                dtype=np.uint32).view(np.int32))
        flat = np.concatenate(parts)
        dev_extras = None
        if extras is not None:
            dev_extras = {k: put(v) for k, v in extras.items()}
        statics = dict(phase=phase, T=len(batch.input_ids),
                       S=len(batch.context_lens), C=len(batch.chunk_seg),
                       gather=gather, filtered_sampling=filtered)
        return (put(flat), prev_tokens, dev_extras), statics

    def dispatch(self, batch: HostBatch, extras=None, prev_tokens=None,
                 gather_idx=None):
        """Enqueue one step and return the sampled-token DEVICE array (S,)
        without a host sync. `prev_tokens` (a previous dispatch's return
        value, still on device) with `gather_idx` (host (S,) int32: this
        step's slot i takes prev slot gather_idx[i]) replaces `input_ids`
        via an in-jit gather — the async-decode chain path.

        ALL batch metadata packs into ONE int32 array: this runtime charges
        ~0.5 ms of dispatch overhead PER ARGUMENT (tools/bench_dispatch.py:
        10 args 5.76 ms vs 1 packed 1.31 ms), which dominated small-model
        decode steps. f32 fields ride as bitcasts."""
        tail, statics = self._pack_args(batch, extras, prev_tokens,
                                        gather_idx)
        self.cache, tokens = self._jit_step(
            self.params, self.cache, *tail, **statics)
        try:
            # Enqueue the D2H copy NOW: on this runtime a blocking
            # np.asarray on a not-yet-transferred result takes a slow RPC
            # path (measured ~1.9 s vs 33 ms with the async copy enqueued).
            tokens.copy_to_host_async()
        except Exception:
            pass
        return tokens

    # -- warmup ------------------------------------------------------------
    def warmup(self):
        """Compile every batch shape up front (prefill buckets + decode,
        each in BOTH sampler modes) so serving never hits a compile stall —
        the role of the reference's warmup_model + torchair cache check
        (llm_engine.py:53-87). Cold-cache path: AOT-compile every shape on
        a thread pool first (persistent-cache population, _aot_compile),
        then run each once for real (validates + seeds the in-memory jit
        cache). The filtered (top-k/top-p) sampler variants — a static jit
        arg that DOUBLES the shape count and that offline benches never
        dispatch — compile on a background daemon thread by default
        (config.warmup_filtered); without warming them at all, the first
        filtered request triggers a multi-minute mid-serving compile."""
        cfg = self.config
        t0 = time.perf_counter()
        jobs = self._warmup_batches(filtered=False)
        if cfg.warmup_filtered == "eager":
            jobs += self._warmup_batches(filtered=True)
        cache_on = cfg.use_graph_cache and not cfg.enforce_eager
        if cache_on and cfg.warmup_threads > 1:
            self._aot_compile(jobs, tag="warmup")
        tok = None
        for label, batch, chain in jobs:
            t1 = time.perf_counter()
            logger.info("warmup: running %s", label)
            if chain == "pure":
                tok = self.dispatch(
                    batch, prev_tokens=tok,
                    gather_idx=np.zeros(batch.context_lens.shape[0],
                                        np.int32))
            elif chain == "hybrid":
                tok = self.dispatch(batch, prev_tokens=tok)
            else:
                tok = self.dispatch(batch)
            np.asarray(tok)
            logger.info("warmup: ran %s (%.1fs)", label,
                        time.perf_counter() - t1)
        # No cache reset needed: pages are always written by a sequence's own
        # prefill before its context_lens exposes them to reads.
        logger.info("warmup: %d shapes ready in %.1fs",
                    len(jobs), time.perf_counter() - t0)
        if cfg.warmup_filtered == "background" and cache_on:
            import threading

            fjobs = self._warmup_batches(filtered=True)

            def work():
                try:
                    self._aot_compile(fjobs, tag="warmup-filtered[bg]")
                except Exception as e:  # best-effort: first filtered
                    # request falls back to an inline compile
                    logger.warning("background filtered warmup failed: %s", e)

            self._bg_warmup = threading.Thread(
                target=work, daemon=True, name="warmup-filtered")
            self._bg_warmup.start()

    def _warmup_batches(self, filtered: bool):
        """Every jit signature the engine can dispatch, as (label, batch,
        chain) jobs. chain: None = plain dispatch, "hybrid" = mixed step
        with gather_idx on the batch, "pure" = dedicated decode-chain shape.
        Ordered so every chain job follows a plain one (in the execute pass
        it reuses the previous dispatch's device token array)."""
        cfg = self.config
        jobs = []
        suff = "-f" if filtered else ""
        for bucket in cfg.prefill_token_buckets:
            jobs.append((f"prefill-T{bucket}{suff}",
                         _fake_batch(cfg, self.dummy_slot, bucket,
                                     phase="prefill", filtered=filtered),
                         None))
            if cfg.chunked_prefill:
                jobs.append((f"mixed-T{bucket}{suff}",
                             _fake_batch(cfg, self.dummy_slot, bucket,
                                         phase="mixed", filtered=filtered),
                             None))
                if cfg.async_decode:
                    # Hybrid chained-mixed variant: input_ids AND
                    # prev_tokens + (T,) gather_idx in one pytree.
                    fake2 = _fake_batch(cfg, self.dummy_slot, bucket,
                                        phase="mixed", filtered=filtered)
                    fake2.gather_idx = np.full(
                        bucket + cfg.max_num_seqs, -1, np.int32)
                    fake2.gather_idx[bucket] = 0
                    jobs.append((f"mixed-chain-T{bucket}{suff}", fake2,
                                 "hybrid"))
        for S in cfg.decode_seq_buckets:
            fake = _fake_batch(cfg, self.dummy_slot, S, phase="decode",
                               filtered=filtered, seq_pad=S)
            jobs.append((f"decode-S{S}{suff}", fake, None))
            if cfg.async_decode:
                # The chain variant is its own pytree (prev_tokens +
                # gather_idx instead of input_ids) — warm it too.
                jobs.append((f"decode-chain-S{S}{suff}", fake, "pure"))
        return jobs

    def _tokens_aval(self):
        """aval of the sampled-token array every dispatch returns. jit
        outputs are UNCOMMITTED, so a plain SDS (no sharding) lowers to the
        same module — attaching a sharding would inject sdy.sharding attrs
        the real call doesn't have and fork the persistent-cache key."""
        return jax.ShapeDtypeStruct((self.config.max_num_seqs,), jnp.int32)

    def _lower_job(self, batch: HostBatch, chain):
        """Trace+lower one warmup signature against ShapeDtypeStructs for
        params/cache/prev_tokens (never touches — or donates — the live
        buffers, so this is also safe from the background thread).

        The SDS must lower to the EXACT module the real dispatch produces
        or the persistent-cache key forks and warmup is wasted (round-5
        postmortem: copying .sharding onto every SDS added sdy.sharding
        attrs for args jit treats as uncommitted — real dispatches missed
        the cache and recompiled everything serially). Rule: only COMMITTED
        arrays (explicit device_put — the sharded-params path) carry their
        sharding into the lowered module."""
        prev = gidx = None
        if chain == "pure":
            prev = self._tokens_aval()
            gidx = np.zeros(batch.context_lens.shape[0], np.int32)
        elif chain == "hybrid":
            prev = self._tokens_aval()
        tail, statics = self._pack_args(batch, prev_tokens=prev,
                                        gather_idx=gidx)
        def aval(x):
            committed = getattr(x, "_committed", False)
            return jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=x.sharding if committed else None)
        params = jax.tree.map(aval, self.params)
        cache = jax.tree.map(aval, self.cache)
        return self._jit_step.lower(params, cache, *tail, **statics)

    def _aot_compile(self, jobs, tag: str):
        """Trace serially (tracing holds the GIL), compile on a thread pool
        (XLA compiles release the GIL: measured ~2x for 2 threads on this
        runtime). Compiled executables land in the persistent cache; the
        later real dispatches re-trace cheaply and deserialize instead of
        recompiling. Round-4 postmortem: the fully serial
        dispatch-to-compile warmup took 12m31s from a cold cache and cost
        the round its official benchmark (BENCH_r04 rc=124)."""
        from concurrent.futures import ThreadPoolExecutor, as_completed

        t0 = time.perf_counter()
        with ThreadPoolExecutor(
                max_workers=max(self.config.warmup_threads, 1)) as pool:
            futures = {}
            for label, batch, chain in jobs:
                futures[pool.submit(self._lower_job(batch, chain).compile)] \
                    = label
                logger.info("%s: traced %s", tag, label)
            done = 0
            for fut in as_completed(futures):
                fut.result()
                done += 1
                logger.info("%s: compiled %s (%d/%d, %.0fs elapsed)",
                            tag, futures[fut], done, len(futures),
                            time.perf_counter() - t0)


def _fake_batch(cfg: Config, dummy_slot: int, T: int, phase: str,
                filtered: bool = False, seq_pad: int = None) -> HostBatch:
    S = seq_pad if seq_pad is not None else cfg.max_num_seqs
    Tp = T
    if phase == "decode":
        Tp, T = 0, S
    elif phase == "mixed":
        T = Tp + S
    nchunks = max(Tp // cfg.prefill_chunk, 1)
    return HostBatch(
        input_ids=np.zeros(T, np.int32),
        seg_ids=np.zeros(T, np.int32),
        positions=np.zeros(T, np.int32),
        slot_mapping=np.full(T, dummy_slot, np.int32),
        block_tables=np.zeros((S, cfg.blocks_per_seq), np.int32),
        context_lens=np.ones(S, np.int32),
        last_token_idx=np.zeros(S, np.int32),
        chunk_seg=np.zeros(nchunks, np.int32),
        temperatures=np.ones(S, np.float32),
        top_k=np.full(S, 40, np.int32) if filtered else np.zeros(S, np.int32),
        top_p=np.ones(S, np.float32),
        num_seqs=1,
        num_tokens=1,
        is_prefill=phase == "prefill",
        phase=phase,
        decode_ctx=np.zeros(S, np.int32) if phase == "mixed" else None,
    )
