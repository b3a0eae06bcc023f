"""Online serving entrypoints (OpenAI-compatible HTTP API).

The reference marks online serving as TODO (reference README.md:22) and
ships only an AsyncEngineArgs stub (utils/arg_utils.py:83-95); this package
implements it on top of AsyncLLMEngine.
"""
