"""Warmup paths: parallel AOT compile (lower().compile() on a thread pool,
persistent-cache population) + the execute pass, across filtered-variant
modes. Round-4 postmortem coverage: the serial dispatch-to-compile warmup
took 12m31s from a cold cache and cost the round its official benchmark
(BENCH_r04 rc=124); this pins the replacement's correctness on CPU.
"""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams


def make_llm(**kw):
    from transformers import Qwen3Config

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )
    base = dict(max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
                num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
                prefill_chunk=16, dtype="float32", attention_backend="jnp",
                warmup=True)
    base.update(kw)
    return LLM(cfg, **base)


@pytest.mark.parametrize("mode", ["off", "eager", "background"])
def test_warmup_modes_then_generate(mode):
    llm = make_llm(warmup_filtered=mode, seed=7)
    bg = getattr(llm.model_runner, "_bg_warmup", None)
    if mode == "background":
        assert bg is not None
        bg.join(timeout=300)
        assert not bg.is_alive()
    else:
        assert bg is None
    rng = np.random.default_rng(0)
    ps = [list(rng.integers(1, 127, size=n)) for n in (9, 33, 17)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(ps, sp, use_tqdm=False)
    assert all(len(o["token_ids"]) == 8 for o in outs)


def test_wait_for_warmup():
    llm = make_llm(warmup_filtered="background")
    assert llm.wait_for_warmup(timeout=300)   # joins the bg thread
    assert llm.wait_for_warmup(timeout=0)     # already done: immediate True
    assert make_llm(warmup_filtered="off").wait_for_warmup()  # no thread
    assert make_llm(warmup=False).wait_for_warmup()


def test_warmup_matches_no_warmup_outputs():
    # Warmup dispatches fake batches through the REAL cache (dummy slot) —
    # generation afterwards must be bit-identical to a cold engine.
    rng = np.random.default_rng(1)
    ps = [list(rng.integers(1, 127, size=n)) for n in (21, 40)]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    a = make_llm(warmup_filtered="off", seed=3).generate(ps, sp,
                                                         use_tqdm=False)
    b = make_llm(warmup=False, seed=3).generate(ps, sp, use_tqdm=False)
    for x, y in zip(a, b):
        assert x["token_ids"] == y["token_ids"]


def test_aot_lowering_matches_real_dispatch_lowering():
    """The AOT warmup lowering (ShapeDtypeStructs) must produce the EXACT
    module the real dispatch produces, or the persistent-cache key forks
    and cold-start warmup compiles everything twice (round-5 postmortem:
    sharding-annotated SDS injected sdy.sharding attrs real calls lack,
    costing a 7-minute double compile on the chip)."""
    llm = make_llm(warmup=False)
    runner = llm.model_runner
    for label, batch, chain in runner._warmup_batches(filtered=False):
        aot = runner._lower_job(batch, chain).as_text()
        prev = gidx = None
        if chain == "pure":
            import jax.numpy as jnp

            prev = jnp.zeros((runner.config.max_num_seqs,), jnp.int32)
            gidx = np.zeros(batch.context_lens.shape[0], np.int32)
        elif chain == "hybrid":
            import jax.numpy as jnp

            prev = jnp.zeros((runner.config.max_num_seqs,), jnp.int32)
        tail, statics = runner._pack_args(batch, prev_tokens=prev,
                                          gather_idx=gidx)
        real = runner._jit_step.lower(runner.params, runner.cache, *tail,
                                      **statics).as_text()
        assert aot == real, f"lowering mismatch for {label}"


def test_warmup_filtered_sampling_still_works():
    # With warmup_filtered="off", a top-k request after warmup must still
    # compile lazily and run.
    llm = make_llm(warmup_filtered="off", seed=5)
    sp = SamplingParams(temperature=0.8, top_k=5, max_tokens=6,
                        ignore_eos=True)
    outs = llm.generate([[1, 2, 3, 4, 5]], sp, use_tqdm=False)
    assert len(outs[0]["token_ids"]) == 6
