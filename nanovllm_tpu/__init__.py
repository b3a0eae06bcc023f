"""nanovllm_tpu — a TPU-native continuous-batching LLM inference engine.

Built from scratch on jax/XLA/Pallas: paged KV-cache attention with prefix
caching, whole-step jit (donated KV buffers), mesh-sharded tensor parallelism,
and Pallas kernels for the attention hot path.

Public API mirrors the reference engine (nano-vllm-ascend,
reference: nanovllm/__init__.py:1-2): `LLM` and `SamplingParams`.
"""

from nanovllm_tpu.sampling_params import SamplingParams

__all__ = ["LLM", "SamplingParams"]
__version__ = "0.1.0"


def __getattr__(name):
    # LLM pulls in jax; keep the package importable for pure data-plane use
    # (tests, tooling) without initializing a backend.
    if name == "LLM":
        from nanovllm_tpu.llm import LLM

        return LLM
    raise AttributeError(name)
