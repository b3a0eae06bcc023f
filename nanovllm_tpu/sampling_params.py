"""Per-request sampling parameters.

Parity target: reference nanovllm/sampling_params.py (temperature, max_tokens,
ignore_eos). Unlike the reference — which forbids greedy decoding — we support
`temperature=0.0` as exact greedy argmax (implemented in-jit via the
gumbel-max sampler, ops/sampler.py).
"""

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False
    top_k: int = 0  # 0 disables top-k
    top_p: float = 1.0  # 1.0 disables top-p

    def __post_init__(self):
        if self.temperature < 0.0:
            raise ValueError("temperature must be >= 0 (0 means greedy)")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        if not (0.0 < self.top_p <= 1.0):
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")
