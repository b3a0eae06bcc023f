"""Async serving front-end over the synchronous engine.

The reference ships an `AsyncEngineArgs` stub but no async engine and marks
online serving TODO (reference nanovllm/utils/arg_utils.py:83-95,
README.md:22); this implements it. One daemon thread drives
`LLMEngine.step()` continuously (the TPU stays busy through the async-decode
chain); request coroutines receive incremental tokens through asyncio
queues fed via `loop.call_soon_threadsafe` after each committed step.

Thread-safety contract: every interaction with the underlying engine
(add/abort/step) happens under `self._lock`; step latency (~tens of ms)
bounds the add-request latency, which is noise next to generation time.
"""

from __future__ import annotations

import asyncio
import threading
from dataclasses import dataclass, field
from typing import AsyncIterator, Optional, Union

from nanovllm_tpu.engine.llm_engine import LLMEngine
from nanovllm_tpu.sampling_params import SamplingParams


@dataclass
class StreamItem:
    """One queue element: newly generated token ids (possibly several, when
    the engine committed more than one step between flushes), plus terminal
    state on the last item."""

    token_ids: list
    finished: bool = False
    finish_reason: Optional[str] = None


@dataclass
class _Tracked:
    seq: object
    queue: asyncio.Queue
    loop: asyncio.AbstractEventLoop
    pushed: int = 0  # completion tokens already delivered


class AsyncLLMEngine:
    """Continuous-batching engine with an asyncio streaming surface.

    Usage:
        engine = AsyncLLMEngine(model, **engine_kwargs)
        async for item in engine.generate_stream(prompt, sampling_params):
            ...
    """

    def __init__(self, model, **kwargs):
        self.engine = LLMEngine(model, **kwargs)
        self._lock = threading.Lock()
        self._tracked: dict[str, _Tracked] = {}
        self._work = threading.Event()
        self._shutdown = False
        self._thread = threading.Thread(target=self._step_loop, daemon=True,
                                        name="nanovllm-step-loop")
        self._thread.start()

    # -- engine thread ------------------------------------------------------
    def _step_loop(self):
        while not self._shutdown:
            with self._lock:
                idle = self.engine.is_finished() and not self._tracked
            if idle:
                self._work.wait(timeout=0.05)
                self._work.clear()
                continue
            try:
                with self._lock:
                    self.engine.step()
                    self._flush_tracked()
            except Exception:  # noqa: BLE001 — keep the loop alive
                import logging

                logging.getLogger(__name__).exception(
                    "engine step failed; erroring out in-flight requests")
                with self._lock:
                    self._fail_tracked()

    def _fail_tracked(self):
        """A step raised: deliver a terminal error item to every consumer so
        no request hangs forever, then drop the tracking state (lock held)."""
        for rid, t in list(self._tracked.items()):
            item = StreamItem(token_ids=[], finished=True,
                              finish_reason="error")
            try:
                if not t.loop.is_closed():
                    t.loop.call_soon_threadsafe(t.queue.put_nowait, item)
            except RuntimeError:
                pass  # consumer loop already gone
            try:
                self.engine.abort_request(rid)
            except Exception:
                pass
        self._tracked.clear()

    def _flush_tracked(self):
        """Push any new completion tokens to their consumers (lock held)."""
        done = []
        for rid, t in self._tracked.items():
            toks = t.seq.completion_token_ids
            finished = t.seq.is_finished
            if len(toks) > t.pushed or finished:
                item = StreamItem(
                    token_ids=list(toks[t.pushed:]),
                    finished=finished,
                    finish_reason=(t.seq.finish_reason.name.lower()
                                   if finished and t.seq.finish_reason
                                   else None))
                t.pushed = len(toks)
                try:
                    if t.loop.is_closed():
                        raise RuntimeError("consumer loop closed")
                    t.loop.call_soon_threadsafe(t.queue.put_nowait, item)
                except RuntimeError:
                    # Consumer's event loop is gone: abort its request and
                    # stop tracking, but keep serving everyone else.
                    finished = True
                    try:
                        self.engine.abort_request(rid)
                    except Exception:
                        pass
            if finished:
                done.append(rid)
        for rid in done:
            del self._tracked[rid]

    # -- async API ----------------------------------------------------------
    async def add_request(self, prompt: Union[str, list],
                          sampling_params: Optional[SamplingParams] = None,
                          request_id: Optional[str] = None) -> tuple:
        """Register a request; returns (request_id, asyncio.Queue of
        StreamItem)."""
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        with self._lock:
            seq = self.engine.add_request(prompt, sampling_params,
                                          request_id=request_id)
            rid = seq.seq_id
            self._tracked[rid] = _Tracked(seq=seq, queue=q, loop=loop)
        self._work.set()
        return rid, q

    async def generate_stream(self, prompt, sampling_params=None,
                              request_id=None) -> AsyncIterator[StreamItem]:
        rid, q = await self.add_request(prompt, sampling_params, request_id)
        try:
            while True:
                item = await q.get()
                yield item
                if item.finished:
                    return
        finally:
            # Consumer went away (disconnect/cancel) before completion.
            with self._lock:
                if rid in self._tracked:
                    del self._tracked[rid]
                    self.engine.abort_request(rid)

    async def generate(self, prompt, sampling_params=None, request_id=None):
        """Non-streaming: returns {"token_ids", "text", "finish_reason"}."""
        tokens, reason = [], None
        async for item in self.generate_stream(prompt, sampling_params,
                                               request_id):
            tokens.extend(item.token_ids)
            if item.finished:
                reason = item.finish_reason
        text = None
        if self.engine.tokenizer is not None:
            text = self.engine.tokenizer.decode(tokens)
        return {"token_ids": tokens, "text": text, "finish_reason": reason}

    def abort(self, request_id: str) -> None:
        with self._lock:
            if request_id in self._tracked:
                del self._tracked[request_id]
            self.engine.abort_request(request_id)

    @property
    def tokenizer(self):
        return self.engine.tokenizer

    def shutdown(self):
        self._shutdown = True
        self._work.set()
        self._thread.join(timeout=5)
