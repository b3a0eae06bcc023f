"""Engine configuration.

Parity target: reference nanovllm/config.py:14-66 (field names kept where they
make sense so reference users find what they expect). TPU-specific additions:
mesh shape knobs, KV-cache dtype (bf16 / int8), prefill token buckets, and the
XLA persistent compilation cache (replacing the reference's torchair
`.torchair_cache`, reference model_runner.py:129-154).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional


_BUCKET_DEFAULT = (512, 2048, 8192, 16384)


@dataclass
class Config:
    model: Any = ""  # path to an HF checkpoint dir, or a PretrainedConfig
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 256
    max_model_len: int = 4096
    gpu_memory_utilization: float = 0.7  # kept name for reference parity
    tensor_parallel_size: int = 1
    enforce_eager: bool = False  # kept for API parity; jit is always on,
    # this only disables the persistent compile cache
    kvcache_block_size: int = 256
    num_kvcache_blocks: int = -1  # -1 = size from free HBM
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | float32 | int8
    dtype: str = "auto"  # model compute dtype: auto | bfloat16 | float32
    quantization: Optional[str] = None  # None | "int8" | "int4" (weight-only)
    # Random-weight init creates quantized tensors DIRECTLY (no bf16
    # staging) — required to bench 30B-class models whose bf16 form cannot
    # even be staged on one chip. Only meaningful with quantization="int4"
    # and no checkpoint path.
    quantized_init: bool = False
    attention_backend: str = "auto"  # auto | pallas | jnp
    use_shard_map: str = "auto"  # auto: shard_map iff tensor_parallel_size>1;
    # "on": always run the step under shard_map on a 1+ device mesh (lets a
    # single chip validate the multi-chip code path)
    native_runtime: str = "auto"  # auto | on | off: C++ block manager
    prefill_chunk: int = 128  # query-chunk alignment of the prefill layout
    # Chunked-prefill interleaving: cap prefill work per step and run decode
    # lanes in the SAME step (mixed phase) so bursts of long prompts don't
    # monopolize steps (round-1 TTFT p99 = 13.4 s pathology). Auto-disabled
    # for multimodal models (vision-slice streaming assumes whole-suffix
    # prefills).
    chunked_prefill: bool = True
    prefill_step_tokens: int = 2048  # prefill-token cap per mixed step
    # Async-decode chain: dispatch step N+1 with step N's sampled tokens
    # still on device (the in-jit gather feeds them in as input_ids), then
    # read step N back while N+1 runs — hides the per-step host sync that
    # round 1 paid on every decode step (~2-4 ms of np.asarray plus the
    # device idle gap between steps). Auto-disabled for multimodal models
    # (their decode extras are data-dependent).
    async_decode: bool = True
    # When set, generate()/generate_multimodal() capture a jax.profiler
    # trace (xprof/tensorboard) of the whole run into this directory —
    # the first-class profiling hook the reference lacks (SURVEY §5).
    profile_trace_dir: Optional[str] = None
    use_graph_cache: bool = True  # persistent XLA compilation cache
    compile_cache_dir: str = os.path.expanduser("~/.cache/nanovllm_tpu_xla")
    # Cold-start controls (round-4 postmortem: a fully serial warmup took
    # 12m31s on a cold compile cache and blew the bench budget). XLA
    # compiles release the GIL on this runtime (measured 2x for 2 threads),
    # so warmup AOT-lowers every shape and compiles them on a thread pool,
    # populating the persistent cache; the real dispatches then re-trace
    # cheaply and deserialize. Needs use_graph_cache.
    warmup_threads: int = 8
    # The filtered (top-k/top-p) sampler variants DOUBLE the shape count and
    # offline benches never use them: "background" AOT-compiles them on a
    # daemon thread after warmup returns; "eager" blocks like round 4;
    # "off" skips them (first filtered request pays an inline compile).
    warmup_filtered: str = "background"  # eager | background | off
    prefill_token_buckets: tuple = _BUCKET_DEFAULT
    # Decode lane padding buckets: a decode/mixed step pads its S axis to the
    # smallest bucket >= live lanes instead of always max_num_seqs, so the
    # run tail / low-concurrency serving stops paying full-batch step
    # latency (one extra jit shape per bucket, compiled at warmup).
    # "auto" derives power-of-two-ish buckets from max_num_seqs; () disables
    # bucketing (always pad to max_num_seqs).
    decode_seq_buckets: Any = "auto"
    eos: int = -1
    seed: int = 0
    is_multimodal: bool = False
    hf_config: Any = field(default=None, repr=False)

    def __post_init__(self):
        assert self.kvcache_block_size % 16 == 0, "block size must be a multiple of 16"
        assert 1 <= self.tensor_parallel_size <= 64
        assert self.warmup_filtered in ("eager", "background", "off"), \
            self.warmup_filtered
        if self.hf_config is None:
            self.hf_config = self._resolve_hf_config()
        # Clamp max_model_len to the model's trained window like the
        # reference does (reference config.py:44-53).
        hf_max = getattr(self.hf_config, "max_position_embeddings", None)
        if hf_max is None and hasattr(self.hf_config, "text_config"):
            hf_max = getattr(self.hf_config.text_config, "max_position_embeddings", None)
        if hf_max:
            self.max_model_len = min(self.max_model_len, int(hf_max))
        if self.eos == -1:
            self.eos = self._resolve_eos()
        arch = (getattr(self.hf_config, "architectures", None) or [""])[0]
        if "VL" in arch or hasattr(self.hf_config, "vision_config"):
            self.is_multimodal = True
        # Multimodal runs BOTH chunked prefill (prepare_extras streams
        # vision slices per window) and the async-decode chain: decode-lane
        # mrope positions are a pure function of the batch's (virtual)
        # position, precomputed like everything else the chain handles
        # (registry.VLAdapter.prepare_extras decode branch).
        # The budget must cover one max-length prompt after chunk alignment.
        aligned_max = -(-self.max_model_len // self.prefill_chunk) * self.prefill_chunk
        self.max_num_batched_tokens = max(self.max_num_batched_tokens, aligned_max)
        if self.chunked_prefill:
            # Window cap must be chunk-aligned and within the token budget.
            cap = -(-self.prefill_step_tokens // self.prefill_chunk) * self.prefill_chunk
            self.prefill_step_tokens = min(cap, self.max_num_batched_tokens)
        # Decode seq buckets: normalize to a sorted tuple ending at
        # max_num_seqs (the shapes warmup compiles and prepare_plan picks
        # from). Buckets are 16-aligned for clean TPU sublane tiles.
        if self.decode_seq_buckets == "auto":
            self.decode_seq_buckets = tuple(sorted(
                {-(-max(self.max_num_seqs >> k, 16) // 16) * 16
                 for k in (3, 2, 1, 0)
                 if max(self.max_num_seqs >> k, 16) <= self.max_num_seqs}))
        if self.decode_seq_buckets:
            buckets = sorted(b for b in self.decode_seq_buckets
                             if b <= self.max_num_seqs)
            if not buckets or buckets[-1] < self.max_num_seqs:
                buckets.append(self.max_num_seqs)
            self.decode_seq_buckets = tuple(buckets)
        else:
            self.decode_seq_buckets = (self.max_num_seqs,)
        # Prefill buckets must cover the full budget.
        buckets = sorted(b for b in self.prefill_token_buckets if b <= self.max_num_batched_tokens)
        if not buckets or buckets[-1] < self.max_num_batched_tokens:
            buckets.append(self.max_num_batched_tokens)
        self.prefill_token_buckets = tuple(buckets)
        if self.chunked_prefill:
            # Under chunking no step carries more prefill tokens than the
            # cap: buckets above it are dead shapes (wasted warmup compiles).
            buckets = [b for b in self.prefill_token_buckets
                       if b <= self.prefill_step_tokens]
            if not buckets or buckets[-1] < self.prefill_step_tokens:
                buckets.append(self.prefill_step_tokens)
            self.prefill_token_buckets = tuple(buckets)

    def _resolve_hf_config(self):
        from transformers import AutoConfig, PretrainedConfig

        if isinstance(self.model, PretrainedConfig) or (
                not isinstance(self.model, str)
                and hasattr(self.model, "architectures")):
            return self.model  # a config object (HF or duck-typed)
        if not self.model:
            raise ValueError("Config.model must be a checkpoint path or a PretrainedConfig")
        return AutoConfig.from_pretrained(self.model, trust_remote_code=True)

    def _resolve_eos(self) -> int:
        cfg = self.hf_config
        eos = getattr(cfg, "eos_token_id", None)
        if eos is None and hasattr(cfg, "text_config"):
            eos = getattr(cfg.text_config, "eos_token_id", None)
        if isinstance(eos, (list, tuple)):
            eos = eos[0] if eos else None
        return int(eos) if eos is not None else -1

    @property
    def model_path(self) -> Optional[str]:
        return self.model if isinstance(self.model, str) and self.model else None

    @property
    def text_config(self):
        return getattr(self.hf_config, "text_config", None) or self.hf_config

    @property
    def blocks_per_seq(self) -> int:
        return (self.max_model_len + self.kvcache_block_size - 1) // self.kvcache_block_size
