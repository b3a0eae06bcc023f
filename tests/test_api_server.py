"""Online serving: AsyncLLMEngine streaming + the OpenAI-compatible HTTP
surface (entrypoints/api_server.py), on CPU with a tiny random-weight model.

The reference has no online serving (README TODO); these tests pin the
build-side contract: concurrent requests stream incrementally, non-stream
completions return usage counts, disconnected streams abort their sequence.
"""

import asyncio
import json

import pytest
from transformers import Qwen3Config

from nanovllm_tpu.engine.async_engine import AsyncLLMEngine
from nanovllm_tpu.sampling_params import SamplingParams


def tiny_cfg():
    return Qwen3Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=512, max_position_embeddings=256,
        architectures=["Qwen3ForCausalLM"])


@pytest.fixture(scope="module")
def engine():
    eng = AsyncLLMEngine(
        tiny_cfg(), attention_backend="jnp", max_num_seqs=4,
        max_model_len=128, max_num_batched_tokens=256,
        num_kvcache_blocks=32, kvcache_block_size=16)
    yield eng
    eng.shutdown()


def test_async_stream_and_concurrency(engine):
    async def run_one(seed):
        toks = []
        items = 0
        async for item in engine.generate_stream(
                [1 + seed, 2, 3], SamplingParams(temperature=0.8,
                                                 max_tokens=12,
                                                 ignore_eos=True)):
            toks.extend(item.token_ids)
            items += 1
            if item.finished:
                assert item.finish_reason == "length"
        assert len(toks) == 12
        # streaming means multiple deliveries, not one final blob
        assert items > 1
        return toks

    async def main():
        return await asyncio.gather(*[run_one(i) for i in range(3)])

    outs = asyncio.run(main())
    assert len(outs) == 3


def test_async_nonstream_generate(engine):
    out = asyncio.run(engine.generate(
        [5, 6, 7], SamplingParams(temperature=0.0, max_tokens=6,
                                  ignore_eos=True)))
    assert len(out["token_ids"]) == 6
    assert out["finish_reason"] == "length"
    # greedy is deterministic: same prompt -> same tokens
    out2 = asyncio.run(engine.generate(
        [5, 6, 7], SamplingParams(temperature=0.0, max_tokens=6,
                                  ignore_eos=True)))
    assert out["token_ids"] == out2["token_ids"]


def test_stream_abort_on_disconnect(engine):
    async def main():
        agen = engine.generate_stream(
            [9, 9, 9], SamplingParams(temperature=0.9, max_tokens=64,
                                      ignore_eos=True))
        item = await agen.__anext__()
        assert item.token_ids
        await agen.aclose()  # client disconnect
        # the sequence must be aborted / untracked
        for _ in range(100):
            with engine._lock:
                if not engine._tracked and engine.engine.is_finished():
                    return True
            await asyncio.sleep(0.02)
        return False

    assert asyncio.run(main())


def test_http_api(engine):
    from aiohttp.test_utils import TestClient, TestServer

    from nanovllm_tpu.entrypoints.api_server import build_app

    async def main():
        app = build_app(engine, model_id="tiny")
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/health")
            # "warming" while the background sampler-variant compiles run
            assert (await r.json())["status"] in ("ok", "warming")
            engine.engine.wait_for_warmup(timeout=300)
            r = await client.get("/health")
            assert (await r.json())["status"] == "ok"

            r = await client.get("/v1/models")
            assert (await r.json())["data"][0]["id"] == "tiny"

            r = await client.post("/v1/completions", json={
                "prompt": [1, 2, 3, 4], "max_tokens": 5,
                "temperature": 0.0, "ignore_eos": True})
            body = await r.json()
            assert body["object"] == "text_completion"
            assert body["choices"][0]["finish_reason"] == "length"
            assert body["usage"]["completion_tokens"] == 5

            # streaming: SSE frames ending with [DONE]
            r = await client.post("/v1/completions", json={
                "prompt": [4, 3, 2], "max_tokens": 6, "temperature": 0.7,
                "ignore_eos": True, "stream": True})
            assert r.headers["Content-Type"].startswith("text/event-stream")
            raw = (await r.read()).decode()
            frames = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
            assert frames[-1] == "[DONE]"
            chunks = [json.loads(f) for f in frames[:-1]]
            assert chunks, "no streamed chunks"
            assert chunks[-1]["choices"][0]["finish_reason"] == "length"
            assert all(c["object"] == "text_completion" for c in chunks)

            # chat endpoint (no chat template on the tokenless model ->
            # needs a tokenizer; skip if absent)
            if engine.tokenizer is None:
                return

    asyncio.run(main())
