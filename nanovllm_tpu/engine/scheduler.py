"""Continuous-batching scheduler with prefill priority and preemption.

Behavioral parity target: reference nanovllm/engine/scheduler.py:41-110 —
  * prefill-priority: drain the waiting queue FCFS under the
    `max_num_seqs` / `max_num_batched_tokens` budgets (the token budget counts
    only the *uncached suffix*, so prefix-cache hits admit more work);
  * otherwise build a decode batch; when the allocator cannot extend a
    running sequence, preempt victims (youngest running first, else the
    sequence itself) back to the head of the waiting queue;
  * postprocess appends the sampled token and finishes sequences on EOS /
    max_tokens / max_model_len;
  * abort by request id.

Unlike the reference, preempted-then-rescheduled sequences re-enter through
`allocate()` and therefore recover their still-cached prefix pages instead of
recomputing everything.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Optional

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.batch import StepPlan, align_up
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import FinishReason, Sequence, SequenceStatus


class Scheduler:

    def __init__(self, config: Config, num_kvcache_blocks: int,
                 non_cacheable_token_ids: Optional[Iterable[int]] = None):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.max_model_len = config.max_model_len
        self.eos = config.eos
        self.prefill_chunk = getattr(config, "prefill_chunk", 128)
        self.chunked = bool(getattr(config, "chunked_prefill", False))
        self.prefill_step_tokens = getattr(config, "prefill_step_tokens", 2048)
        # One physical block is reserved as the scratch page that padded
        # decode lanes write into (reference scheduler.py:26-30) — the
        # allocator never hands it out.
        self.block_manager = None
        if getattr(config, "native_runtime", "auto") in ("auto", "on"):
            try:
                from nanovllm_tpu.native.runtime import NativeBlockManager

                self.block_manager = NativeBlockManager(
                    num_kvcache_blocks - 1, config.kvcache_block_size,
                    non_cacheable_token_ids=non_cacheable_token_ids,
                    max_blocks_per_seq=config.blocks_per_seq)
            except Exception:
                if getattr(config, "native_runtime", "auto") == "on":
                    raise
        if self.block_manager is None:
            self.block_manager = BlockManager(
                num_kvcache_blocks - 1,
                config.kvcache_block_size,
                non_cacheable_token_ids=non_cacheable_token_ids,
            )
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    def add(self, seq: Sequence) -> None:
        if len(seq) > self.max_model_len:
            raise ValueError(
                f"prompt of {len(seq)} tokens exceeds max_model_len={self.max_model_len}")
        if seq.num_blocks > self.block_manager.num_blocks:
            # Would wait forever: the page pool can never hold it.
            raise ValueError(
                f"prompt needs {seq.num_blocks} KV blocks but the pool only has "
                f"{self.block_manager.num_blocks}")
        self.waiting.append(seq)

    def schedule(self) -> tuple[list[Sequence], bool]:
        """Returns (batch, is_prefill). Empty batch means nothing runnable."""
        batch: list[Sequence] = []
        tokens = 0
        while self.waiting and len(batch) < self.max_num_seqs:
            seq = self.waiting[0]
            if not self.block_manager.can_allocate(seq):
                break
            if seq.block_table:
                # Preempted sequence re-entering: pages were freed, table must
                # be rebuilt from scratch.
                raise AssertionError("waiting sequence with live block table")
            # Admission is budgeted on the chunk-aligned device cost
            # (engine/batch.py lays each suffix out CQ-aligned). The check
            # uses the full-length upper bound; allocate() can only shrink
            # the real cost via prefix-cache hits.
            def aligned(n):
                return -(-n // self.prefill_chunk) * self.prefill_chunk

            if tokens + aligned(len(seq)) > self.max_num_batched_tokens and batch:
                break
            self.waiting.popleft()
            self.block_manager.allocate(seq)
            seq.num_computed_tokens = seq.num_cached_tokens
            seq.status = SequenceStatus.RUNNING
            seq.finish_reason = None
            self.running.append(seq)
            batch.append(seq)
            tokens += aligned(len(seq) - seq.num_cached_tokens)
        if batch:
            return batch, True

        while self.running and len(batch) < self.max_num_seqs:
            seq = self.running.popleft()
            while not self.block_manager.can_append_slot(seq):
                if self.running:
                    self.preempt(self.running.pop())
                else:
                    self.preempt(seq)
                    seq = None
                    break
            if seq is not None:
                self.block_manager.append_slot(seq)
                batch.append(seq)
        self.running.extendleft(reversed(batch))
        return batch, False

    # -- chunked-prefill interleaved scheduling ----------------------------
    def schedule_plan(self) -> StepPlan:
        """One step's plan. With chunked_prefill on, a step carries decode
        lanes AND capped prefill windows simultaneously — prefills no longer
        monopolize steps (the round-1 TTFT p99 pathology; the reference has
        no such mode at all, its scheduler is strictly two-phase,
        scheduler.py:41-77)."""
        if not self.chunked:
            seqs, is_prefill = self.schedule()
            if not seqs:
                return StepPlan([], [], "decode")
            if is_prefill:
                return StepPlan(
                    [(s, s.num_cached_tokens, len(s) - s.num_cached_tokens)
                     for s in seqs], [], "prefill")
            return StepPlan([], seqs, "decode")

        budget = self.prefill_step_tokens
        used = 0
        prefill: list = []
        decode: list = []
        scheduled: set = set()

        def preempt_for(seq) -> bool:
            """Free a page for `seq`; victims are the youngest running seqs
            not already in this batch (legacy discipline). Returns False if
            `seq` itself had to be preempted."""
            while not self.block_manager.can_append_slot(seq):
                victim = None
                for cand in reversed(self.running):
                    if cand is not seq and id(cand) not in scheduled:
                        victim = cand
                        break
                if victim is None:
                    self.running.remove(seq)
                    self.preempt(seq)
                    return False
                self.running.remove(victim)
                self.preempt(victim)
            return True

        # 1) running sequences, FCFS: decode lanes for finished prefills,
        #    window continuations for mid-prefill seqs.
        for seq in list(self.running):
            if seq.status is not SequenceStatus.RUNNING:
                continue
            if len(prefill) + len(decode) >= self.max_num_seqs:
                break
            remaining = len(seq) - seq.num_computed_tokens
            if remaining == 1:
                if preempt_for(seq):
                    self.block_manager.append_slot(seq)
                    decode.append(seq)
                    scheduled.add(id(seq))
            elif used < budget:
                span = min(remaining, budget - used)
                prefill.append((seq, seq.num_computed_tokens, span))
                scheduled.add(id(seq))
                used += align_up(span, self.prefill_chunk)

        # 2) admit waiting sequences into leftover budget/slots.
        while self.waiting and used < budget \
                and len(prefill) + len(decode) < self.max_num_seqs:
            seq = self.waiting[0]
            if not self.block_manager.can_allocate(seq):
                break
            self.waiting.popleft()
            self.block_manager.allocate(seq)
            seq.num_computed_tokens = seq.num_cached_tokens
            seq.status = SequenceStatus.RUNNING
            seq.finish_reason = None
            self.running.append(seq)
            scheduled.add(id(seq))
            remaining = len(seq) - seq.num_computed_tokens
            span = min(remaining, budget - used)
            prefill.append((seq, seq.num_computed_tokens, span))
            used += align_up(span, self.prefill_chunk)

        phase = "mixed" if (prefill and decode) else \
            ("decode" if decode else "prefill")
        return StepPlan(prefill, decode, phase)

    def schedule_plan_ahead(self, prev: StepPlan):
        """Plan the step AFTER `prev` BEFORE prev's sampled tokens reach the
        host — the generalization of the pure-decode async chain to prefill
        windows and mixed steps (each non-chained step otherwise idles the
        device for a full host round-trip, measured ~30 ms on this runtime).

        Everything the next step needs is value-independent except the
        input token of lanes that EMIT at prev's commit (completed prefills
        and decode lanes): those become VIRTUAL decode lanes whose input the
        runner gathers on device from prev's token array. Window
        continuations use known prompt ids; admissions use known prompts.

        Returns (plan, gather_src) — gather_src[j] is prev's slot index for
        plan.decode[j] (-1 = host-known input) — or None when the next step
        would need a preemption (pages freed by a still-in-flight step must
        not be reallocated; the caller falls back to synchronous
        scheduling). Mutates real scheduler state exactly like
        schedule_plan: this plan WILL be dispatched."""
        if not self.chunked:
            return None
        # Virtual emissions at prev's commit (seq -> prev slot index), and
        # the computed-token counts prev's commit WILL set — read-only
        # overrides, never mutated into the sequences: prev's postprocess
        # (assignment for windows, increment for decode lanes) still runs.
        emit_slot: dict[int, int] = {}
        adv: dict[int, int] = {}
        slot = 0
        for seq, start, span in prev.prefill:
            adv[id(seq)] = start + span
            if start + span >= len(seq):
                emit_slot[id(seq)] = slot
            slot += 1
        for seq in prev.decode:
            adv[id(seq)] = seq.num_computed_tokens + 1
            emit_slot[id(seq)] = slot
            slot += 1

        budget = self.prefill_step_tokens
        used = 0
        prefill: list = []
        decode: list = []
        gather_src: list = []

        for seq in list(self.running):
            if seq.status is not SequenceStatus.RUNNING:
                continue
            if len(prefill) + len(decode) >= self.max_num_seqs:
                break
            virt = 1 if id(seq) in emit_slot else 0
            vlen = len(seq) + virt
            if virt and (seq.num_completion_tokens + 1 >= seq.max_tokens
                         or vlen >= self.max_model_len):
                continue  # finishes at prev's commit
            comp = adv.get(id(seq), seq.num_computed_tokens)
            remaining = vlen - comp
            if remaining == 1:
                if virt:
                    if self.block_manager.can_reserve_for_chain(seq) \
                            > self.block_manager.num_free_blocks:
                        return None  # page pressure -> sync path (preempt)
                    self.block_manager.reserve_for_chain(seq)
                else:
                    if not self.block_manager.can_append_slot(seq):
                        return None
                    self.block_manager.append_slot(seq)
                decode.append(seq)
                gather_src.append(emit_slot.get(id(seq), -1))
            elif remaining > 1 and used < budget:
                # Mid-prompt window: pages were allocated for the whole
                # prompt at admission; inputs are known prompt ids.
                span = min(remaining, budget - used)
                prefill.append((seq, comp, span))
                used += align_up(span, self.prefill_chunk)

        while self.waiting and used < budget \
                and len(prefill) + len(decode) < self.max_num_seqs:
            seq = self.waiting[0]
            if not self.block_manager.can_allocate(seq):
                break
            self.waiting.popleft()
            self.block_manager.allocate(seq)
            seq.num_computed_tokens = seq.num_cached_tokens
            seq.status = SequenceStatus.RUNNING
            seq.finish_reason = None
            self.running.append(seq)
            remaining = len(seq) - seq.num_computed_tokens
            span = min(remaining, budget - used)
            prefill.append((seq, seq.num_computed_tokens, span))
            used += align_up(span, self.prefill_chunk)

        phase = "mixed" if (prefill and decode) else \
            ("decode" if decode else "prefill")
        return StepPlan(prefill, decode, phase, chained=True), gather_src

    def postprocess_plan(self, plan: StepPlan, token_ids: list[int]) -> None:
        """Advance computed-token counters; append tokens only for lanes
        that actually emitted one (completed prefills + decodes)."""
        slot = 0
        for seq, start, span in plan.prefill:
            token_id = token_ids[slot]
            slot += 1
            if plan.chained and seq.status is not SequenceStatus.RUNNING:
                continue  # aborted after the chained dispatch: zombie window
            seq.num_computed_tokens = start + span
            if seq.num_computed_tokens >= len(seq):
                # Final window reached the last prompt position: the KV row
                # for position len-1 is the NEXT step's write (decode lane
                # semantics), so computed stays len-1 after the append.
                self._emit(seq, token_id)
        for seq in plan.decode:
            token_id = token_ids[slot]
            slot += 1
            if plan.chained and seq.status is not SequenceStatus.RUNNING:
                # Zombie lane: the sequence finished (EOS/abort) at the
                # previous commit, after this chain step was already
                # dispatched. Its sampled token is discarded; its KV writes
                # only ever touched unpublished pages.
                continue
            seq.num_computed_tokens += 1
            self._emit(seq, token_id)
            if plan.chained and not seq.is_finished:
                # The chain bypasses append_slot (which seals filled blocks
                # at schedule time), so publish just-filled trailing blocks
                # here. Sound only for chained plans: the step writing the
                # block's last KV row is already dispatched, so any later
                # consumer prefill runs after it on device.
                self.block_manager.seal_filled(seq)

    def _emit(self, seq: Sequence, token_id: int) -> None:
        seq.append_token(token_id)
        hit_eos = (not seq.ignore_eos) and token_id == self.eos
        hit_max = seq.num_completion_tokens >= seq.max_tokens
        hit_len = len(seq) >= self.max_model_len
        if hit_eos:
            self.finish(seq, FinishReason.EOS)
            self.running.remove(seq)
        elif hit_max or hit_len:
            self.finish(seq, FinishReason.LENGTH)
            self.running.remove(seq)

    def preempt(self, seq: Sequence) -> None:
        seq.status = SequenceStatus.WAITING
        seq.finish_reason = FinishReason.PREEMPTED
        self.block_manager.deallocate(seq)
        self.waiting.appendleft(seq)

    def abort(self, request_id: str) -> None:
        for queue in (self.waiting, self.running):
            for seq in [s for s in queue if s.request_id == request_id]:
                queue.remove(seq)
                self.finish(seq, FinishReason.ABORTED)

    def finish(self, seq: Sequence, reason: FinishReason) -> None:
        seq.status = SequenceStatus.FINISHED
        seq.finish_reason = reason
        self.block_manager.deallocate(seq)

    def postprocess(self, seqs: list[Sequence], token_ids: list[int]) -> None:
        for seq, token_id in zip(seqs, token_ids):
            seq.append_token(token_id)
            hit_eos = (not seq.ignore_eos) and token_id == self.eos
            hit_max = seq.num_completion_tokens >= seq.max_tokens
            hit_len = len(seq) >= self.max_model_len
            if hit_eos:
                self.finish(seq, FinishReason.EOS)
                self.running.remove(seq)
            elif hit_max or hit_len:
                self.finish(seq, FinishReason.LENGTH)
                self.running.remove(seq)
