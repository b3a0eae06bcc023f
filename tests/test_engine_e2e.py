"""End-to-end engine tests on CPU: LLM.generate through the full stack
(scheduler -> batch prep -> jitted step -> sampler -> postprocess)."""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_llm():
    from transformers import Qwen3Config

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )
    return LLM(cfg, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
               num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
               prefill_chunk=16, dtype="float32", attention_backend="jnp",
               warmup=False)


def prompts(rng, n, lo=5, hi=40):
    return [list(rng.integers(1, 127, size=int(rng.integers(lo, hi)))) for _ in range(n)]


def test_generate_greedy_deterministic(tiny_llm):
    rng = np.random.default_rng(0)
    ps = prompts(rng, 3)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out1 = tiny_llm.generate(ps, sp, use_tqdm=False)
    out2 = tiny_llm.generate(ps, sp, use_tqdm=False)
    for a, b in zip(out1, out2):
        assert a["token_ids"] == b["token_ids"]
        assert len(a["token_ids"]) == 8


def test_generate_more_requests_than_slots(tiny_llm):
    rng = np.random.default_rng(1)
    ps = prompts(rng, 10)  # > max_num_seqs=4: exercises continuous batching
    sp = SamplingParams(temperature=0.5, max_tokens=6, ignore_eos=True)
    outs = tiny_llm.generate(ps, sp, use_tqdm=False)
    assert len(outs) == 10
    assert all(len(o["token_ids"]) == 6 for o in outs)


def test_prefix_cache_hits_across_calls(tiny_llm):
    rng = np.random.default_rng(2)
    base = list(rng.integers(1, 127, size=33))  # two full 16-blocks + tail
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    first = tiny_llm.generate([base], sp, use_tqdm=False)
    second = tiny_llm.generate([base], sp, use_tqdm=False)
    assert second[0]["cache_tokens"] >= 32  # prefix reused from the first call
    assert first[0]["token_ids"] == second[0]["token_ids"]  # same greedy result


def test_mixed_temperatures_and_seeded_sampling(tiny_llm):
    rng = np.random.default_rng(3)
    ps = prompts(rng, 4)
    sps = [SamplingParams(temperature=t, max_tokens=5, ignore_eos=True)
           for t in (0.0, 0.3, 0.7, 1.0)]
    outs = tiny_llm.generate(ps, sps, use_tqdm=False)
    assert all(len(o["token_ids"]) == 5 for o in outs)


def test_abort_and_reuse(tiny_llm):
    rng = np.random.default_rng(4)
    seq = tiny_llm.add_request(prompts(rng, 1)[0],
                               SamplingParams(max_tokens=50, ignore_eos=True),
                               request_id="gone")
    tiny_llm.abort_request("gone")
    assert tiny_llm.is_finished()
    assert seq.finish_reason is not None
