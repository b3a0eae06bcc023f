"""Scheduler invariants (parity with reference ut/test_scheduler.py)."""

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import FinishReason, Sequence, SequenceStatus
from nanovllm_tpu.sampling_params import SamplingParams


class FakeHFConfig:
    max_position_embeddings = 64
    eos_token_id = 0


def make_config(**kw):
    defaults = dict(
        model=None,
        hf_config=FakeHFConfig(),
        max_num_seqs=4,
        max_num_batched_tokens=64,
        max_model_len=64,
        kvcache_block_size=16,
        prefill_chunk=1,  # no alignment: keeps budget arithmetic exact here
    )
    defaults.update(kw)
    return Config(**defaults)


def make_scheduler(num_blocks=32, **kw):
    return Scheduler(make_config(**kw), num_kvcache_blocks=num_blocks)


_seq_salt = 0


def seq_of(n, bs=16, **sp):
    global _seq_salt
    _seq_salt += 1  # distinct prompts so tests don't accidentally share pages
    return Sequence([_seq_salt * 1000 + i for i in range(n)],
                    SamplingParams(**sp), block_size=bs)


def test_prefill_scheduling_sets_running():
    sch = make_scheduler()
    s = seq_of(10)
    sch.add(s)
    batch, is_prefill = sch.schedule()
    assert is_prefill and batch == [s]
    assert s.status == SequenceStatus.RUNNING
    assert sch.num_running == 1 and sch.num_waiting == 0


def test_token_budget_cuts_prefill_batch():
    sch = make_scheduler()
    a, b, c = seq_of(30), seq_of(30), seq_of(30)
    for s in (a, b, c):
        sch.add(s)
    batch, is_prefill = sch.schedule()
    assert is_prefill and batch == [a, b]  # 30+30 fits 64, +30 doesn't
    assert sch.num_waiting == 1


def test_max_num_seqs_cuts_prefill_batch():
    sch = make_scheduler(max_num_seqs=2)
    seqs = [seq_of(4) for _ in range(5)]
    for s in seqs:
        sch.add(s)
    batch, _ = sch.schedule()
    assert len(batch) == 2


def test_decode_after_prefill():
    sch = make_scheduler()
    s = seq_of(10)
    sch.add(s)
    sch.schedule()
    batch, is_prefill = sch.schedule()
    assert not is_prefill and batch == [s]


def test_preemption_on_cache_oom():
    # 3 blocks available (4 physical minus the reserved scratch page);
    # two 16-token seqs (1 block each) + decode growth forces preemption.
    sch = make_scheduler(num_blocks=4, max_num_batched_tokens=64)
    a, b = seq_of(16), seq_of(16)
    sch.add(a)
    sch.add(b)
    batch, is_prefill = sch.schedule()
    assert is_prefill and len(batch) == 2
    # Simulate decode growth: each append at len%bs==1 needs a new page.
    sch.postprocess([a, b], [5, 5])  # len 17 each
    batch, is_prefill = sch.schedule()
    assert not is_prefill
    # Only one free block: the youngest running (b) gets preempted.
    assert batch == [a]
    assert b.status == SequenceStatus.WAITING
    assert b.finish_reason == FinishReason.PREEMPTED
    assert b.block_table == []
    assert sch.num_waiting == 1


def test_preempted_seq_reschedules_as_prefill():
    sch = make_scheduler(num_blocks=4)
    a, b = seq_of(16), seq_of(16)
    sch.add(a)
    sch.add(b)
    sch.schedule()
    sch.postprocess([a, b], [5, 5])
    sch.schedule()  # preempts b
    sch.postprocess([a], [0])  # a hits EOS -> frees its pages
    assert a.is_finished and a.finish_reason == FinishReason.EOS
    batch, is_prefill = sch.schedule()
    assert is_prefill and batch == [b]
    assert b.status == SequenceStatus.RUNNING


def test_postprocess_eos_frees_seq():
    sch = make_scheduler()
    s = seq_of(10)
    sch.add(s)
    sch.schedule()
    sch.postprocess([s], [0])  # eos id = 0
    assert s.is_finished and s.finish_reason == FinishReason.EOS
    assert sch.is_finished()


def test_ignore_eos_and_max_tokens():
    sch = make_scheduler()
    s = seq_of(10, ignore_eos=True, max_tokens=2)
    sch.add(s)
    sch.schedule()
    sch.postprocess([s], [0])
    assert not s.is_finished
    sch.schedule()
    sch.postprocess([s], [0])
    assert s.is_finished and s.finish_reason == FinishReason.LENGTH


def test_abort_by_request_id():
    sch = make_scheduler()
    s = Sequence([1, 2, 3], SamplingParams(), request_id="req-1", block_size=16)
    sch.add(s)
    sch.abort("req-1")
    assert s.is_finished and s.finish_reason == FinishReason.ABORTED
    assert sch.is_finished()
