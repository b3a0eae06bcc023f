"""Data-parallel replica serving: a pool of independent engines, each on
its own tensor-parallel device mesh.

The reference has no data parallelism (SURVEY §2b: TP is its only
strategy); this is the TPU-native DP design the survey sketches as an
"optional mesh axis for replica serving on pods". It is deliberately NOT a
second mesh axis inside one jitted step: continuous batching makes every
replica's schedule (batch shapes, phase, preemptions) diverge step to
step, so a joint (dp, tp) program would force all replicas into lockstep
padded shapes — the slowest replica's shape every step. Independent
engines on disjoint device groups share nothing but the host process, and
XLA runs their dispatches concurrently (per-device execution streams).
"""

from __future__ import annotations

import logging
from typing import Union

import jax
import numpy as np

from nanovllm_tpu.parallel import tp as tplib
from nanovllm_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class DataParallelPool:
    """`dp` independent LLM engines, engine r on devices
    [r*tp, (r+1)*tp). Requests route to the least-loaded replica;
    `generate` distributes round-robin and preserves input order.

    Per-replica determinism: each engine seeds its sampler from
    (seed + replica index) by default so replicas don't emit identical
    streams for identical prompts; pass `same_seed=True` to make every
    replica a bit-identical state machine (the multihost invariant,
    parallel/multihost.py)."""

    def __init__(self, model, dp: int, tensor_parallel_size: int = 1,
                 same_seed: bool = False, **kwargs):
        from nanovllm_tpu.engine.llm_engine import LLMEngine

        tp = tensor_parallel_size
        devs = jax.devices()
        if len(devs) < dp * tp:
            raise ValueError(
                f"dp={dp} x tp={tp} needs {dp * tp} devices, "
                f"have {len(devs)}")
        self.dp = dp
        self.engines = []
        base_seed = kwargs.pop("seed", 0)
        for r in range(dp):
            mesh = tplib.make_mesh(tp, devices=devs[r * tp: (r + 1) * tp])
            seed = base_seed if same_seed else base_seed + r
            self.engines.append(LLMEngine(
                model, tensor_parallel_size=tp, mesh=mesh, seed=seed,
                use_shard_map="on", **kwargs))
        logger.info("DP pool: %d replicas x tp=%d over %d devices",
                    dp, tp, dp * tp)

    # -- routing -------------------------------------------------------------
    def _least_loaded(self) -> int:
        loads = [len(e.scheduler.running) + len(e.scheduler.waiting)
                 for e in self.engines]
        return int(np.argmin(loads))

    def add_request(self, prompt, sampling_params=None, replica=None,
                    **kwargs):
        """Route one request; returns (replica_index, Sequence)."""
        r = self._least_loaded() if replica is None else replica
        return r, self.engines[r].add_request(prompt, sampling_params,
                                              **kwargs)

    def step(self):
        """One engine iteration on every replica that has work. Replicas
        dispatch back-to-back before any blocks on its commit, so their
        device steps overlap."""
        outs = []
        for r, eng in enumerate(self.engines):
            if not eng.is_finished():
                finished, ntok = eng.step()
                outs.append((r, finished, ntok))
        return outs

    def is_finished(self) -> bool:
        return all(e.is_finished() for e in self.engines)

    def generate(self, prompts, sampling_params: Union[
            SamplingParams, list, None] = None, use_tqdm: bool = False):
        """Round-robin the prompts across replicas, run all replicas to
        completion, return outputs in input order (same record layout as
        LLMEngine.generate)."""
        if sampling_params is None:
            sampling_params = SamplingParams()
        sps = (sampling_params if isinstance(sampling_params, list)
               else [sampling_params] * len(prompts))
        assignment = []  # (replica, seq) per input
        for i, (p, sp) in enumerate(zip(prompts, sps)):
            r = i % self.dp
            _, seq = self.add_request(p, sp, replica=r)
            assignment.append((r, seq))
        results = {}
        while not self.is_finished():
            for r, finished, _ in self.step():
                for sid, token_ids, plen, cached in finished:
                    results[(r, sid)] = (token_ids, plen, cached)
        outputs = []
        for r, seq in assignment:
            token_ids, plen, cached = results[(r, seq.seq_id)]
            text = ""
            tok = self.engines[r].tokenizer
            if tok is not None:
                text = tok.decode(token_ids)
            outputs.append({"text": text, "token_ids": token_ids,
                            "prompt_len": plen, "cache_tokens": cached,
                            "replica": r})
        return outputs
