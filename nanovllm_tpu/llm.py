"""Top-level `LLM` entry point (reference nanovllm/llm.py:4-6)."""

from nanovllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
