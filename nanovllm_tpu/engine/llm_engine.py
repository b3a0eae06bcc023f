"""Engine orchestrator: tokenizer + scheduler + runner + the step loop.

Parity target: reference nanovllm/engine/llm_engine.py:30-176 — same public
surface (`add_request`, `step`, `generate`, `abort_request`, `is_finished`)
and the same generate() output records ({"text", "token_ids", "prompt_len",
"cache_tokens"}). Single process per host: no worker spawning, no SHM RPC
(reference llm_engine.py:39-49) — XLA SPMD owns the chips.
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Union

import numpy as np

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.batch import StepPlan
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus
from nanovllm_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class LLMEngine:

    def __init__(self, model, **kwargs):
        config_keys = set(Config.__dataclass_fields__)
        cfg_kwargs = {k: v for k, v in kwargs.items() if k in config_keys}
        unknown = set(kwargs) - config_keys - {"warmup", "mesh"}
        if unknown:
            logger.warning("ignoring unknown engine kwargs: %s", sorted(unknown))
        self.config = Config(model=model, **cfg_kwargs)
        self.tokenizer = self._load_tokenizer()
        if self.config.eos < 0 and self.tokenizer is not None \
                and self.tokenizer.eos_token_id is not None:
            self.config.eos = int(self.tokenizer.eos_token_id)

        self.model_runner = ModelRunner(self.config,
                                        mesh=kwargs.get("mesh"))
        self.scheduler = Scheduler(
            self.config, self.model_runner.num_kvcache_blocks,
            non_cacheable_token_ids=self._non_cacheable_token_ids())
        # Async-decode chain state: a dispatched-but-uncommitted step
        # (StepPlan, device token array). See step().
        self._inflight = None
        if kwargs.get("warmup", True):
            self.model_runner.warmup()

    def wait_for_warmup(self, timeout: Optional[float] = None) -> bool:
        """Block until the BACKGROUND part of warmup (the filtered-sampler
        jit variants, config.warmup_filtered="background") has finished
        compiling. Latency-sensitive callers (serving benches, readiness
        probes) call this before accepting traffic: the background thread's
        tracing holds the GIL in bursts and visibly inflates step-dispatch
        jitter (measured +9 ms TPOT p50) if left running under load.
        Returns True when warmup is fully done."""
        thread = getattr(self.model_runner, "_bg_warmup", None)
        if thread is not None:
            thread.join(timeout)
            return not thread.is_alive()
        return True

    def _load_tokenizer(self):
        path = self.config.model_path
        if not path:
            return None
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(path)
        except Exception as e:  # tokenless checkpoints: token-id prompts only
            logger.warning("no tokenizer loaded (%s); pass token-id prompts", e)
            return None

    def _non_cacheable_token_ids(self):
        if not self.config.is_multimodal:
            return None
        ids = []
        # video_token_id included: video placeholder blocks are runs of one
        # repeated id, so two different videos would otherwise produce
        # identical token blocks and false prefix-cache hits.
        for attr in ("image_token_id", "video_token_id",
                     "vision_start_token_id", "vision_end_token_id"):
            tid = getattr(self.config.hf_config, attr, None)
            if tid is not None:
                ids.append(int(tid))
        return ids

    # -- request lifecycle --------------------------------------------------
    def add_request(self, prompt: Union[str, list[int]],
                    sampling_params: Optional[SamplingParams] = None,
                    request_id: Optional[str] = None,
                    **mm_kwargs) -> Sequence:
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string prompt but no tokenizer available")
            prompt = self.tokenizer.encode(prompt)
        if self.config.is_multimodal \
                and mm_kwargs.get("pixel_values_videos") is not None:
            mm_kwargs = self._merge_vision_inputs(prompt, mm_kwargs)
        if self.config.is_multimodal and mm_kwargs.get("pixel_values") is not None \
                and not mm_kwargs.get("vision_placeholders"):
            mm_kwargs["vision_placeholders"] = self._find_vision_spans(prompt)
        seq = Sequence(prompt, sampling_params, request_id=request_id,
                       block_size=self.config.kvcache_block_size, **mm_kwargs)
        seq.arrival_time = time.perf_counter()
        self.scheduler.add(seq)
        return seq

    def abort_request(self, request_id: str) -> None:
        self.scheduler.abort(request_id)

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    def step(self):
        """One engine iteration. Returns (finished_outputs, num_tokens) where
        num_tokens > 0 counts prefill tokens, < 0 counts decode tokens
        (the reference's tqdm-throughput convention, llm_engine.py:120-127).
        With chunked_prefill (default) a step may be MIXED: capped prefill
        windows plus decode lanes in one forward pass.

        Async-decode pipelining (config.async_decode): in decode steady
        state the next step is DISPATCHED before the current step's tokens
        are read back — its inputs are the current step's device samples,
        gathered in-jit — so the host sync and batch prep overlap device
        execution instead of serializing with it. Each step() call then
        commits the PREVIOUS dispatch while the next one runs."""
        inflight = self._inflight
        if inflight is None:
            plan = self.scheduler.schedule_plan()
            if plan.is_empty:
                return [], 0
            _, dev_tokens = self.model_runner.dispatch_plan(plan)
            inflight = (plan, dev_tokens)
        # Chain the NEXT step (device) before the blocking readback below.
        self._inflight = self._try_chain(*inflight)
        outputs, num_tokens = self._commit(*inflight)
        if self._inflight is not None:
            nplan = self._inflight[0]
            if not nplan.prefill and nplan.decode \
                    and all(s.is_finished for s in nplan.decode):
                # Every chained lane finished at this commit: the in-flight
                # step is all zombies — nothing to commit, drop it.
                self._inflight = None
        return outputs, num_tokens

    def _try_chain(self, plan, dev_tokens):
        """Dispatch the step AFTER `plan` (still uncommitted): decode
        continuations, mid-prompt window continuations, and fresh
        admissions are all value-independent given the in-flight step's
        device token array (scheduler.schedule_plan_ahead), so the host
        round-trip (~30 ms on this runtime) overlaps device execution on
        EVERY step, not just pure-decode runs. Lanes certain to finish at
        commit (max_tokens / max_model_len) are excluded; EOS cannot be
        predicted, so EOS-finished lanes ride along as zombies one step."""
        if not self.config.async_decode:
            return None
        ahead = self.scheduler.schedule_plan_ahead(plan)
        if ahead is None:
            return None  # page pressure (needs preemption) or legacy mode
        plan2, gather_src = ahead
        if plan2.is_empty:
            return None
        if not plan2.prefill and gather_src and all(g >= 0 for g in gather_src):
            # Pure-decode all-virtual: the dedicated chain batch shape.
            idx = np.zeros(self.config.max_num_seqs, np.int32)
            idx[: len(gather_src)] = gather_src
            _, tokens = self.model_runner.dispatch_chain(
                plan2.decode, dev_tokens, idx)
            return (StepPlan([], plan2.decode, "decode", chained=True),
                    tokens)
        _, tokens = self.model_runner.dispatch_plan_ahead(
            plan2, gather_src, dev_tokens)
        return (plan2, tokens)

    def _commit(self, plan, dev_tokens):
        """Blocking readback + postprocess of a dispatched step."""
        token_ids = np.asarray(dev_tokens)[: len(plan.seqs)].tolist()
        now = time.perf_counter()
        seqs = plan.seqs
        self.scheduler.postprocess_plan(plan, token_ids)
        for seq in seqs:
            # First token emitted iff the seq has completion tokens now.
            if seq.first_token_time is None and seq.num_completion_tokens > 0:
                seq.first_token_time = now
        outputs = [
            (seq.seq_id, seq.completion_token_ids, seq.num_prompt_tokens,
             seq.num_cached_tokens)
            for seq in seqs if seq.is_finished
        ]
        if plan.phase == "decode":
            num_tokens = -len(plan.decode)
        else:
            num_tokens = sum(span for _, _, span in plan.prefill) \
                + len(plan.decode)
        return outputs, num_tokens

    def _merge_vision_inputs(self, prompt, mm):
        """Unify image and VIDEO inputs into span-ordered pixel rows,
        per-placeholder mrope grids, and an encode plan.

        Qwen3-VL treats video frames as INDEPENDENT images: each frame is
        its own placeholder run (timestamp tokens separate frames), the
        rope index splits video_grid_thw into per-frame (1, h, w) grids
        (HF modeling_qwen3_vl.get_rope_index:925-928), and the vision
        tower segments attention and position embeddings PER FRAME
        (cu_seqlens repeats h*w per t, modeling_qwen3_vl.py:727). So a
        video simply becomes t frame-images spliced into the unified
        pixel/grid lists in span order. The reference has no video support
        at all — this is an extension."""
        import numpy as np

        pv = mm.pop("pixel_values", None)
        ig = mm.pop("image_grid_thw", None)
        pvv = mm.pop("pixel_values_videos")
        vg = mm.pop("video_grid_thw", None)
        vid = getattr(self.config.hf_config, "video_token_id", None)
        spans = mm.get("vision_placeholders") or self._find_vision_spans(prompt)
        mm["vision_placeholders"] = spans
        pv = None if pv is None else np.asarray(pv, np.float32)
        pvv = np.asarray(pvv, np.float32)
        ig = [tuple(int(x) for x in g) for g in (ig if ig is not None else [])]
        vg = [tuple(int(x) for x in g) for g in (vg if vg is not None else [])]
        rows, grids = [], []
        ii = vi = 0
        img_row = vid_row = 0
        vframes = 0
        for start, _ln in spans:
            if prompt[start] == vid:
                t, h, w = vg[vi]
                rows.append(pvv[vid_row: vid_row + h * w])
                vid_row += h * w
                grids.append((1, h, w))
                vframes += 1
                if vframes == t:
                    vi += 1
                    vframes = 0
            else:
                t, h, w = ig[ii]
                n = t * h * w
                rows.append(pv[img_row: img_row + n])
                img_row += n
                grids.append((t, h, w))
                ii += 1
        mm["pixel_values"] = np.concatenate(rows, axis=0)
        mm["image_grid_thw"] = grids
        return mm

    def _find_vision_spans(self, token_ids):
        """Runs of image/video placeholder tokens -> [(start, length)]
        (the reference expands placeholders itself, llm_engine.py:221-277;
        HF processors emit pre-expanded ids, so spans are just scanned)."""
        img = getattr(self.config.hf_config, "image_token_id", None)
        vid = getattr(self.config.hf_config, "video_token_id", None)
        spans = []
        start = None
        for i, t in enumerate(token_ids):
            if t == img or t == vid:
                if start is None:
                    start = i
            elif start is not None:
                spans.append((start, i - start))
                start = None
        if start is not None:
            spans.append((start, len(token_ids) - start))
        return spans

    def generate_multimodal(self, requests, sampling_params=None,
                            processor=None, use_tqdm: bool = True):
        """Multimodal batch generation (reference llm_engine.py:178-219).

        Each request is a dict with either
          {"prompt": str, "images": [...], "videos": [...]} (requires an HF
          processor), or pre-processed
          {"input_ids": [...], "pixel_values": array,
           "image_grid_thw": [(t, h, w), ...],
           "pixel_values_videos": array, "video_grid_thw": [...]}.
        """
        if sampling_params is None:
            sampling_params = SamplingParams()
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(requests)
        seq_order = []
        for req, sp in zip(requests, sampling_params):
            vid_kwargs = {}
            if "input_ids" in req:
                ids = list(req["input_ids"])
                pixel_values = req.get("pixel_values")
                grids = req.get("image_grid_thw")
                if req.get("pixel_values_videos") is not None:
                    vid_kwargs = {
                        "pixel_values_videos": req["pixel_values_videos"],
                        "video_grid_thw": req.get("video_grid_thw")}
            else:
                if processor is None:
                    raise ValueError("string prompts need an HF processor")
                messages = [{"role": "user", "content": [
                    *({"type": "image", "image": im} for im in req.get("images", [])),
                    *({"type": "video", "video": v} for v in req.get("videos", [])),
                    {"type": "text", "text": req["prompt"]},
                ]}]
                text = processor.apply_chat_template(
                    messages, tokenize=False, add_generation_prompt=True)
                enc = processor(text=[text], images=req.get("images") or None,
                                videos=req.get("videos") or None,
                                return_tensors="np")
                ids = enc["input_ids"][0].tolist()
                pixel_values = enc.get("pixel_values")
                grids = enc.get("image_grid_thw")
                if enc.get("pixel_values_videos") is not None:
                    vid_kwargs = {
                        "pixel_values_videos": enc["pixel_values_videos"],
                        "video_grid_thw": enc.get("video_grid_thw")}
            seq = self.add_request(ids, sp, pixel_values=pixel_values,
                                   image_grid_thw=grids, **vid_kwargs)
            seq_order.append(seq.seq_id)

        done = {}
        while not self.is_finished():
            outputs, _ = self.step()
            for seq_id, token_ids, prompt_len, cache_tokens in outputs:
                done[seq_id] = (token_ids, prompt_len, cache_tokens)
        results = []
        for seq_id in seq_order:
            token_ids, prompt_len, cache_tokens = done[seq_id]
            text = self.tokenizer.decode(token_ids) if self.tokenizer else None
            results.append({"text": text, "token_ids": token_ids,
                            "prompt_len": prompt_len,
                            "cache_tokens": cache_tokens})
        return results

    # -- batch generation ---------------------------------------------------
    def generate(self, prompts, sampling_params=None, use_tqdm: bool = True):
        if sampling_params is None:
            sampling_params = SamplingParams()
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        seq_order = [self.add_request(p, sp).seq_id
                     for p, sp in zip(prompts, sampling_params)]

        pbar = None
        if use_tqdm:
            from tqdm.auto import tqdm

            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)
        prefill_tp = decode_tp = 0.0
        done = {}
        from nanovllm_tpu.utils import perf

        with perf.trace(self.config.profile_trace_dir):
            while not self.is_finished():
                t = time.perf_counter()
                outputs, num_tokens = self.step()
                if pbar is not None:
                    dt = max(time.perf_counter() - t, 1e-9)
                    if num_tokens > 0:
                        prefill_tp = num_tokens / dt
                    elif num_tokens < 0:
                        decode_tp = -num_tokens / dt
                    pbar.set_postfix({"Prefill": f"{int(prefill_tp)}tok/s",
                                      "Decode": f"{int(decode_tp)}tok/s"})
                for seq_id, token_ids, prompt_len, cache_tokens in outputs:
                    done[seq_id] = (token_ids, prompt_len, cache_tokens)
                    if pbar is not None:
                        pbar.update(1)
        if pbar is not None:
            pbar.close()
        results = []
        for seq_id in seq_order:
            token_ids, prompt_len, cache_tokens = done[seq_id]
            text = self.tokenizer.decode(token_ids) if self.tokenizer else None
            results.append({"text": text, "token_ids": token_ids,
                            "prompt_len": prompt_len, "cache_tokens": cache_tokens})
        return results
