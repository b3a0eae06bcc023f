"""Decode seq buckets: pure-decode steps pad their lane axis to the smallest
configured bucket >= live lanes instead of always max_num_seqs.

Checks: (a) bucket derivation/normalization in Config, (b) prepare_plan picks
the bucket for pure decode only, (c) greedy outputs are bit-identical to the
non-bucketed (full-pad) engine across continuous batching + async chaining.
"""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.batch import StepPlan, prepare_plan


class _StubHF:
    architectures = ["Qwen3ForCausalLM"]
    max_position_embeddings = 4096
    eos_token_id = 0


def _cfg(**kw):
    return Config(model="", hf_config=_StubHF(), **kw)


def test_auto_bucket_derivation():
    assert _cfg(max_num_seqs=192).decode_seq_buckets == (32, 48, 96, 192)
    assert _cfg(max_num_seqs=256).decode_seq_buckets == (32, 64, 128, 256)
    assert _cfg(max_num_seqs=16).decode_seq_buckets == (16,)
    assert _cfg(max_num_seqs=4).decode_seq_buckets == (4,)
    # explicit buckets: clipped to max and forced to end at max_num_seqs
    assert _cfg(max_num_seqs=64, decode_seq_buckets=(16, 128)
                ).decode_seq_buckets == (16, 64)
    # disabled: always full pad
    assert _cfg(max_num_seqs=64, decode_seq_buckets=()
                ).decode_seq_buckets == (64,)


class _Seq:
    def __init__(self, n, table):
        self._n = n
        self.block_table = table
        self.temperature = 1.0
        self.token_ids = list(range(n))
        self.num_cached_tokens = 0

    def __len__(self):
        return self._n

    @property
    def last_token(self):
        return self.token_ids[-1]


def _mk_plan(n):
    seqs = [_Seq(5 + i, [2 * i + 1, 2 * i + 2]) for i in range(n)]
    return StepPlan([], seqs, "decode")


def test_prepare_plan_buckets_pure_decode_only():
    kw = dict(block_size=16, dummy_slot=0, max_num_seqs=64, blocks_per_seq=4,
              token_buckets=(128,), chunk=16, seq_buckets=(16, 32, 64))
    b = prepare_plan(_mk_plan(3), **kw)
    assert b.context_lens.shape == (16,) and b.input_ids.shape == (16,)
    b = prepare_plan(_mk_plan(20), **kw)
    assert b.context_lens.shape == (32,)
    # mixed steps keep the full S axis
    seqs = [_Seq(40, [1, 2, 3])]
    plan = StepPlan([(seqs[0], 0, 40)], _mk_plan(2).decode, "mixed")
    b = prepare_plan(plan, **kw)
    assert b.context_lens.shape == (64,)


@pytest.mark.parametrize("async_decode", [False, True])
def test_greedy_identical_to_full_pad(async_decode):
    from transformers import Qwen3Config

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )
    kw = dict(max_num_seqs=8, max_model_len=128, kvcache_block_size=16,
              num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
              prefill_chunk=16, dtype="float32", attention_backend="jnp",
              warmup=False, async_decode=async_decode)
    rng = np.random.default_rng(7)
    ps = [list(rng.integers(1, 127, size=int(rng.integers(5, 40))))
          for _ in range(12)]
    sps = [SamplingParams(temperature=0.0, ignore_eos=True,
                          max_tokens=int(rng.integers(3, 12))) for _ in ps]
    out_bucketed = LLM(cfg, **kw, decode_seq_buckets=(4, 8)).generate(
        ps, sps, use_tqdm=False)
    out_full = LLM(cfg, **kw, decode_seq_buckets=()).generate(
        ps, sps, use_tqdm=False)
    for a, b in zip(out_bucketed, out_full):
        assert a["token_ids"] == b["token_ids"]
