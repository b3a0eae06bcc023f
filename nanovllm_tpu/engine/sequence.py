"""Per-request state.

Parity target: reference nanovllm/engine/sequence.py:10-149 (status /
finish-reason lifecycle, block-view helpers, multimodal metadata). The TPU
engine is single-process per host, so there is no custom pickling — the
reference's __getstate__ machinery existed only for its shared-memory RPC.
"""

from __future__ import annotations

import enum
from itertools import count
from typing import Any, Optional

from nanovllm_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    FINISHED = enum.auto()


class FinishReason(enum.Enum):
    EOS = enum.auto()
    LENGTH = enum.auto()
    ABORTED = enum.auto()
    PREEMPTED = enum.auto()


class Sequence:
    """One request: prompt tokens + generated tokens + cache bookkeeping."""

    _ids = count()

    def __init__(
        self,
        token_ids: list[int],
        sampling_params: Optional[SamplingParams] = None,
        request_id: Optional[str] = None,
        block_size: int = 256,
        pixel_values: Any = None,
        image_grid_thw: Any = None,
        vision_placeholders: Optional[list[tuple[int, int]]] = None,
    ):
        if not token_ids:
            raise ValueError("empty prompt")
        sp = sampling_params or SamplingParams()
        self.seq_id = next(Sequence._ids)
        self.request_id = request_id
        self.block_size = block_size
        self.token_ids = list(token_ids)
        self.num_prompt_tokens = len(token_ids)
        self.num_cached_tokens = 0
        # KV rows materialized in the cache so far (chunked prefill advances
        # this window-by-window; always len(self)-1 for decode-ready seqs).
        self.num_computed_tokens = 0
        self.status = SequenceStatus.WAITING
        self.finish_reason: Optional[FinishReason] = None
        self.block_table: list[int] = []
        self.temperature = sp.temperature
        self.max_tokens = sp.max_tokens
        self.ignore_eos = sp.ignore_eos
        self.top_k = sp.top_k
        self.top_p = sp.top_p
        self.arrival_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        # Multimodal metadata (qwen3_vl path): raw pixels parked on host,
        # vision-token spans within the prompt, and per-span consumption
        # counters for chunked prefill (reference sequence.py:51-71).
        self.pixel_values = pixel_values
        # Per-PLACEHOLDER grids: a video contributes one (1, h, w) entry
        # per frame (Qwen3-VL frames are independent images to both the
        # vision tower and the rope index; llm_engine._merge_vision_inputs).
        self.image_grid_thw = image_grid_thw
        self.vision_placeholders = list(vision_placeholders or [])
        self.vision_consumed = [0] * len(self.vision_placeholders)
        self.cached_vision_tokens = None
        self.cached_deepstack_tokens = None
        self.mrope_prompt_pos = None   # (3, prompt_len) int32, lazily built
        self.mrope_next = None         # first rope position after the prompt

    # -- views ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.token_ids)

    @property
    def num_completion_tokens(self) -> int:
        return len(self.token_ids) - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens:]

    @property
    def last_token(self) -> int:
        return self.token_ids[-1]

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_blocks(self) -> int:
        return -(-len(self.token_ids) // self.block_size)

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        return len(self.token_ids) - (self.num_blocks - 1) * self.block_size

    def block_tokens(self, i: int) -> list[int]:
        """Token ids covered by logical block i."""
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size: (i + 1) * self.block_size]

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)

    def __repr__(self) -> str:
        reason = self.finish_reason.name if self.finish_reason else "-"
        return f"Sequence(id={self.seq_id}, n={len(self)}, {self.status.name}/{reason})"
