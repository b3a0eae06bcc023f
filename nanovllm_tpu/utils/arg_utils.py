"""CLI argument plumbing for scripts.

Parity target: reference nanovllm/utils/arg_utils.py:11-144 (`EngineArgs`
dataclass with add_cli_args/from_cli_args; the reference's AsyncEngineArgs is
a stub there and is mirrored as one here).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, fields
from typing import Optional


@dataclass
class EngineArgs:
    model: str = ""
    dtype: str = "auto"
    kv_cache_dtype: str = "auto"
    quantization: Optional[str] = None
    tensor_parallel_size: int = 1
    kvcache_block_size: int = 256
    gpu_memory_utilization: float = 0.7
    max_num_batched_tokens: int = 4096
    max_num_seqs: int = 96
    max_model_len: int = 4096
    enforce_eager: bool = False
    attention_backend: str = "auto"
    seed: int = 0

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser.add_argument("--model", type=str, default=EngineArgs.model)
        parser.add_argument("--dtype", type=str, default=EngineArgs.dtype,
                            choices=["auto", "bfloat16", "float32"])
        parser.add_argument("--kv-cache-dtype", type=str,
                            default=EngineArgs.kv_cache_dtype,
                            choices=["auto", "bfloat16", "float32", "int8"])
        parser.add_argument("--quantization", type=str, default=None,
                            choices=["int8", "int4"])
        parser.add_argument("--tensor-parallel-size", "-tp", type=int,
                            default=EngineArgs.tensor_parallel_size)
        parser.add_argument("--kvcache-block-size", type=int,
                            default=EngineArgs.kvcache_block_size)
        parser.add_argument("--gpu-memory-utilization", type=float,
                            default=EngineArgs.gpu_memory_utilization)
        parser.add_argument("--max-num-batched-tokens", type=int,
                            default=EngineArgs.max_num_batched_tokens)
        parser.add_argument("--max-num-seqs", type=int,
                            default=EngineArgs.max_num_seqs)
        parser.add_argument("--max-model-len", type=int,
                            default=EngineArgs.max_model_len)
        parser.add_argument("--enforce-eager", action="store_true")
        parser.add_argument("--attention-backend", type=str,
                            default=EngineArgs.attention_backend,
                            choices=["auto", "pallas", "jnp", "reference"])
        parser.add_argument("--seed", type=int, default=EngineArgs.seed)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        names = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in names})

    def engine_kwargs(self) -> dict:
        kw = {f.name: getattr(self, f.name) for f in fields(self)}
        kw.pop("model")
        return kw


@dataclass
class AsyncEngineArgs(EngineArgs):
    """Async serving args — used by entrypoints/api_server.py (the
    reference keeps this as a stub with no async engine behind it,
    reference arg_utils.py:83-95)."""

    disable_log_requests: bool = False

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        EngineArgs.add_cli_args(parser)
        parser.add_argument("--disable-log-requests", action="store_true")
        return parser

    def engine_kwargs(self) -> dict:
        kw = super().engine_kwargs()
        kw.pop("disable_log_requests", None)
        return kw
