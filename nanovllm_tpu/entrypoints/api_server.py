"""OpenAI-compatible HTTP server over AsyncLLMEngine (aiohttp).

Endpoints:
    GET  /health               -> {"status": "ok"}
    GET  /v1/models            -> model listing
    POST /v1/completions       -> text completion (stream or not)
    POST /v1/chat/completions  -> chat (tokenizer chat template), stream or not

The reference lists online serving as TODO (reference README.md:22); this is
the build-side implementation. Streaming uses server-sent events with the
OpenAI `data: {...}` / `data: [DONE]` framing so standard clients work.

Run: python -m nanovllm_tpu.entrypoints.api_server --model PATH --port 8000
"""

from __future__ import annotations

import argparse
import json
import time
import uuid

from aiohttp import web

from nanovllm_tpu.engine.async_engine import AsyncLLMEngine
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.arg_utils import AsyncEngineArgs

MODEL_ID_KEY = web.AppKey("model_id", str)
ENGINE_KEY = web.AppKey("engine", AsyncLLMEngine)


def _sampling_from_request(body: dict) -> SamplingParams:
    return SamplingParams(
        temperature=float(body.get("temperature", 1.0)),
        max_tokens=int(body.get("max_tokens", 16)),
        top_k=int(body.get("top_k", 0) or 0),
        top_p=float(body.get("top_p", 1.0)),
        ignore_eos=bool(body.get("ignore_eos", False)),
    )


def _completion_payload(rid, model_id, text, finish_reason, *, chat,
                        delta=False):
    now = int(time.time())
    if chat:
        msg_key = "delta" if delta else "message"
        choice = {"index": 0, msg_key: {"role": "assistant", "content": text},
                  "finish_reason": finish_reason}
        obj = "chat.completion.chunk" if delta else "chat.completion"
    else:
        choice = {"index": 0, "text": text, "finish_reason": finish_reason}
        obj = "text_completion"
    return {"id": rid, "object": obj, "created": now, "model": model_id,
            "choices": [choice]}


async def _respond(request: web.Request, prompt, body: dict, *, chat: bool):
    engine = request.app[ENGINE_KEY]
    model_id = request.app[MODEL_ID_KEY]
    sp = _sampling_from_request(body)
    rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
    tok = engine.tokenizer

    if body.get("stream"):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        async for item in engine.generate_stream(prompt, sp):
            text = tok.decode(item.token_ids) if tok else \
                " ".join(map(str, item.token_ids))
            payload = _completion_payload(
                rid, model_id, text,
                item.finish_reason if item.finished else None,
                chat=chat, delta=True)
            await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    out = await engine.generate(prompt, sp)
    text = out["text"] if out["text"] is not None else \
        " ".join(map(str, out["token_ids"]))
    payload = _completion_payload(rid, model_id, text, out["finish_reason"],
                                  chat=chat)
    if isinstance(prompt, list):
        n_prompt = len(prompt)
    else:  # OpenAI schema wants an integer; tokenize string prompts
        n_prompt = len(tok.encode(prompt)) if tok else 0
    payload["usage"] = {
        "prompt_tokens": n_prompt,
        "completion_tokens": len(out["token_ids"]),
        "total_tokens": n_prompt + len(out["token_ids"]),
    }
    return web.json_response(payload)


async def handle_completions(request: web.Request):
    body = await request.json()
    prompt = body.get("prompt")
    if prompt is None:
        raise web.HTTPBadRequest(text="missing 'prompt'")
    return await _respond(request, prompt, body, chat=False)


async def handle_chat(request: web.Request):
    body = await request.json()
    messages = body.get("messages")
    if not messages:
        raise web.HTTPBadRequest(text="missing 'messages'")
    engine = request.app[ENGINE_KEY]
    tok = engine.tokenizer
    if tok is None:
        raise web.HTTPBadRequest(text="chat endpoint needs a tokenizer")
    if getattr(tok, "chat_template", None):
        prompt = tok.apply_chat_template(messages, tokenize=True,
                                         add_generation_prompt=True)
    else:  # tokenless test models: naive concatenation
        prompt = tok.encode("\n".join(m.get("content", "") for m in messages))
    return await _respond(request, prompt, body, chat=True)


async def handle_models(request: web.Request):
    return web.json_response({"object": "list", "data": [{
        "id": request.app[MODEL_ID_KEY], "object": "model",
        "owned_by": "nanovllm_tpu"}]})


async def handle_health(request: web.Request):
    """Readiness: "warming" while the background filtered-sampler compiles
    are still running (serving then works but step dispatch sees GIL bursts
    from the compile thread's tracing), "ok" once fully warm."""
    engine = request.app[ENGINE_KEY].engine
    warm = engine.wait_for_warmup(timeout=0)
    return web.json_response({"status": "ok" if warm else "warming"})


def build_app(engine: AsyncLLMEngine, model_id: str = "default") -> web.Application:
    app = web.Application()
    app[ENGINE_KEY] = engine
    app[MODEL_ID_KEY] = model_id
    app.router.add_get("/health", handle_health)
    app.router.add_get("/v1/models", handle_models)
    app.router.add_post("/v1/completions", handle_completions)
    app.router.add_post("/v1/chat/completions", handle_chat)
    return app


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()
    eargs = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine(eargs.model, **eargs.engine_kwargs())
    app = build_app(engine, model_id=eargs.model or "default")
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
