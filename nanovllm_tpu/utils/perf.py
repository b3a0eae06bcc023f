"""Performance accounting: model FLOPs, chip peaks, MFU / bandwidth math,
and the jax.profiler trace hook.

The reference ships no profiling beyond tqdm counters (SURVEY §5;
reference llm_engine.py:153-165 postfix, model_runner.py:391-392 step log).
Here utilization is first-class: tools/profile_step.py and bench.py report
MFU and effective HBM bandwidth against the chip's roofline, and any engine
run can capture an XLA trace for xprof/tensorboard via
Config.profile_trace_dir.
"""

from __future__ import annotations

import contextlib
from typing import Optional

# Published per-chip peaks. (dense bf16 matmul TFLOP/s, int8 TOP/s,
# HBM GiB/s). v5e figures: 197 bf16 / 394 int8 TFLOPs, 819 GB/s;
# v4: 275 bf16, 1229 GB/s; v6e: 918 bf16 / 1836 int8, 1640 GB/s.
_CHIP_PEAKS = {
    "TPU v4": (275e12, 275e12, 1229e9),
    "TPU v5 lite": (197e12, 394e12, 819e9),
    "TPU v5e": (197e12, 394e12, 819e9),
    "TPU v5": (459e12, 918e12, 2765e9),
    "TPU v5p": (459e12, 918e12, 2765e9),
    "TPU v6 lite": (918e12, 1836e12, 1640e9),
    "TPU v6e": (918e12, 1836e12, 1640e9),
}
_DEFAULT_PEAK = (197e12, 394e12, 819e9)


def chip_peaks(device=None):
    """(bf16 FLOP/s, int8 OP/s, HBM bytes/s) for the local device."""
    if device is None:
        import jax

        device = jax.local_devices()[0]
    kind = getattr(device, "device_kind", "")
    return _CHIP_PEAKS.get(kind, _DEFAULT_PEAK)


def dense_param_count(spec) -> int:
    """Weight elements touched per token by a DenseSpec forward (embedding
    lookup excluded — it is a gather, not a matmul)."""
    D, L = spec.hidden_size, spec.num_layers
    per_layer = (D * spec.qkv_size              # wqkv
                 + spec.q_size * D              # wo
                 + D * 2 * spec.intermediate_size
                 + spec.intermediate_size * D)
    return L * per_layer + D * spec.vocab_size  # + lm_head


def decode_step_flops(spec, batch_size: int, context: int) -> int:
    """Matmul FLOPs of one decode step: 2*params per token plus attention
    score+value dots over the context (2 * 2 * ctx * q_heads * head_dim)."""
    per_tok = 2 * dense_param_count(spec)
    attn = 4 * context * spec.num_q_heads * spec.head_dim
    return batch_size * (per_tok + attn * spec.num_layers)


def prefill_flops(spec, num_tokens: int, avg_context: Optional[int] = None) -> int:
    """Matmul FLOPs of a prefill of num_tokens (causal attention counted at
    avg_context ~ T/2 keys per query when not given)."""
    if avg_context is None:
        avg_context = num_tokens // 2
    per_tok = 2 * dense_param_count(spec)
    attn = 4 * avg_context * spec.num_q_heads * spec.head_dim
    return num_tokens * (per_tok + attn * spec.num_layers)


def decode_kv_bytes(spec, batch_size: int, context: int, itemsize: int) -> int:
    """KV-cache bytes a decode step must stream from HBM."""
    return (2 * spec.num_layers * batch_size * context
            * spec.num_kv_heads * spec.head_dim * itemsize)


def decode_weight_bytes(spec, itemsize: int) -> int:
    """Weight bytes one decode step streams (each weight read once)."""
    return dense_param_count(spec) * itemsize


def mfu(flops: int, seconds: float, device=None, dtype="bf16") -> float:
    peak_bf16, peak_int8, _ = chip_peaks(device)
    peak = peak_int8 if dtype == "int8" else peak_bf16
    return flops / seconds / peak


def hbm_frac(bytes_moved: int, seconds: float, device=None) -> float:
    _, _, peak = chip_peaks(device)
    return bytes_moved / seconds / peak


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """jax.profiler trace capture (view with tensorboard/xprof). No-op when
    trace_dir is falsy, so call sites can pass config.profile_trace_dir
    unconditionally."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def device_sync(x):
    """Fence on device work. NOTE: x.block_until_ready() does NOT
    synchronize through the axon TPU tunnel (measured: a 4x8192^3 matmul
    'completes' in 0.05 ms) — a tiny host readback is the only reliable
    fence, so that is what this does."""
    import numpy as np

    leaf = None
    import jax

    for leaf in jax.tree.leaves(x):
        break
    if leaf is not None:
        np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel")
                                  else leaf))
    return x
