"""Qwen3-MoE parity vs HF transformers on CPU (routing + grouped matmul
dispatch must match the sequential-expert reference computation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu.engine.batch import prepare_batch
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models import moe
from nanovllm_tpu.ops.attention import AttnMeta, KVCache
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.loader import load_moe_params

BLOCK, NBLOCKS, MAXB, S = 16, 64, 8, 4
BUCKETS = (64, 128)


def make_tiny_moe(mlp_only_layers=(), decoder_sparse_step=1, layers=2):
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(3)
    cfg = Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_experts=8, num_experts_per_tok=3,
        norm_topk_prob=True, decoder_sparse_step=decoder_sparse_step,
        mlp_only_layers=list(mlp_only_layers),
        num_hidden_layers=layers, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        architectures=["Qwen3MoeForCausalLM"],
    )
    return cfg, Qwen3MoeForCausalLM(cfg).eval()


def test_moe_prefill_and_decode_parity():
    import torch

    cfg, model = make_tiny_moe()
    spec = moe.spec_from_hf(cfg, max_model_len=128)
    params = load_moe_params(spec, model.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(1, 127, size=n)) for n in (9, 21)]

    bm = BlockManager(NBLOCKS - 1, BLOCK)
    seqs = [Sequence(list(p), SamplingParams(), block_size=BLOCK) for p in prompts]
    for s in seqs:
        bm.allocate(s)
    cache = KVCache.zeros(2, NBLOCKS, BLOCK, spec.base.num_kv_heads,
                          spec.base.head_dim, jnp.float32)

    def run(batch, cache):
        meta = AttnMeta(*[jnp.asarray(x) for x in
                          (batch.seg_ids, batch.positions, batch.slot_mapping,
                           batch.block_tables, batch.context_lens,
                           batch.last_token_idx, batch.chunk_seg, batch.num_seqs)])
        hidden, cache = moe.forward(spec, params, jnp.asarray(batch.input_ids),
                                    meta, cache)
        return np.asarray(moe.compute_logits(spec, params, hidden)), cache

    hf_logits = []
    token_seqs = [list(p) for p in prompts]
    for step in range(3):
        step_logits = []
        for ts in token_seqs:
            with torch.no_grad():
                step_logits.append(model(torch.tensor([ts])).logits[0, -1].float().numpy())
        hf_logits.append(np.stack(step_logits))
        for i, ts in enumerate(token_seqs):
            ts.append(int(rng.integers(0, 128)))

    batch = prepare_batch(seqs, True, block_size=BLOCK, dummy_slot=(NBLOCKS - 1) * BLOCK,
                          max_num_seqs=S, blocks_per_seq=MAXB, token_buckets=BUCKETS, chunk=16)
    ours, cache = run(batch, cache)
    np.testing.assert_allclose(ours[:2], hf_logits[0], rtol=5e-4, atol=5e-4)

    for step in range(1, 3):
        for i, s in enumerate(seqs):
            s.append_token(token_seqs[i][len(s)])
            bm.append_slot(s)
        batch = prepare_batch(seqs, False, block_size=BLOCK, dummy_slot=(NBLOCKS - 1) * BLOCK,
                              max_num_seqs=S, blocks_per_seq=MAXB, token_buckets=BUCKETS, chunk=16)
        ours, cache = run(batch, cache)
        np.testing.assert_allclose(ours[:2], hf_logits[step], rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("mlp_only,step", [((1,), 1), ((), 2)])
def test_moe_dense_sparse_interleave_parity(mlp_only, step):
    """mlp_only_layers / decoder_sparse_step (reference qwen3_moe.py:208-218):
    dense layers run through the chunk-expert decomposition and must match
    HF's real dense MLP exactly."""
    import torch

    cfg, model = make_tiny_moe(mlp_only_layers=mlp_only,
                               decoder_sparse_step=step, layers=3)
    spec = moe.spec_from_hf(cfg, max_model_len=128)
    assert not spec.uniform_sparse
    params = load_moe_params(spec, model.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(9)
    prompt = list(rng.integers(1, 127, size=13))
    with torch.no_grad():
        hf = model(torch.tensor([prompt])).logits[0, -1].float().numpy()

    bm = BlockManager(NBLOCKS - 1, BLOCK)
    seq = Sequence(list(prompt), SamplingParams(), block_size=BLOCK)
    bm.allocate(seq)
    cache = KVCache.zeros(3, NBLOCKS, BLOCK, spec.base.num_kv_heads,
                          spec.base.head_dim, jnp.float32)
    batch = prepare_batch([seq], True, block_size=BLOCK,
                          dummy_slot=(NBLOCKS - 1) * BLOCK, max_num_seqs=S,
                          blocks_per_seq=MAXB, token_buckets=BUCKETS, chunk=16)
    meta = AttnMeta(*[jnp.asarray(x) for x in
                      (batch.seg_ids, batch.positions, batch.slot_mapping,
                       batch.block_tables, batch.context_lens,
                       batch.last_token_idx, batch.chunk_seg, batch.num_seqs)])
    hidden, _ = moe.forward(spec, params, jnp.asarray(batch.input_ids),
                            meta, cache)
    ours = np.asarray(moe.compute_logits(spec, params, hidden))
    np.testing.assert_allclose(ours[0], hf, rtol=5e-4, atol=5e-4)


def test_moe_engine_e2e():
    from nanovllm_tpu import LLM, SamplingParams as SP

    cfg, _ = make_tiny_moe()
    llm = LLM(cfg, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
              num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
              prefill_chunk=16, dtype="float32", attention_backend="jnp",
              warmup=False)
    rng = np.random.default_rng(6)
    out = llm.generate([list(rng.integers(1, 127, size=12))],
                       SP(temperature=0.0, max_tokens=6, ignore_eos=True),
                       use_tqdm=False)
    assert len(out[0]["token_ids"]) == 6


def test_expert_sharding_matches_full():
    """Local-expert slices + zero-masked combine must reproduce the full
    moe_block output (the EP invariant, minus the psum)."""
    import jax
    from dataclasses import replace

    cfg, model = make_tiny_moe()
    spec = moe.spec_from_hf(cfg, max_model_len=128)
    params = load_moe_params(spec, model.state_dict(), dtype=jnp.float32)
    lp = jax.tree.map(lambda x: x[0], params["layers"])  # layer 0
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((10, spec.base.hidden_size)).astype(np.float32))

    big = {n: params["layers"][n] for n in ("w_gate_up", "w_down")}
    full = moe.moe_block(spec, big, lp, x, 0)
    halves = []
    E = spec.num_experts
    for shard in range(2):
        lo, hi = shard * E // 2, (shard + 1) * E // 2
        big_s = {n: big[n][:, lo:hi] for n in big}
        spec_s = replace(spec, ep_offset=lo, num_local_experts=E // 2)
        # ragged_dot's group_offset requires a traced context
        halves.append(jax.jit(moe.moe_block, static_argnums=0)(
            spec_s, big_s, lp, x, 0))
    combined = halves[0] + halves[1]
    np.testing.assert_allclose(np.asarray(combined), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_moe_int4_experts_match_dequantized():
    """INT4 experts (chunked in-step dequant + absorber-group accumulation)
    must reproduce moe_block EXACTLY against the same dequantized float
    weights — isolates the chunk/dispatch math from quantization noise."""
    import jax

    from nanovllm_tpu.ops.quant import quantize_int4_biased, unpack_int4_biased

    cfg, model = make_tiny_moe()
    spec = moe.spec_from_hf(cfg, max_model_len=128)
    params = load_moe_params(spec, model.state_dict(), dtype=jnp.float32)
    lp = jax.tree.map(lambda x: x[0], params["layers"])  # layer 0

    big_q, big_f = {}, {}
    for name in ("w_gate_up", "w_down"):
        q, s = quantize_int4_biased(params["layers"][name])
        big_q[name] = q
        big_q[name + "_scale"] = s
        big_f[name] = unpack_int4_biased(q, s).astype(jnp.float32)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((10, spec.base.hidden_size)
                                        ).astype(np.float32))
    got = np.asarray(moe.moe_block(spec, big_q, lp, x, 0))
    want = np.asarray(moe.moe_block(spec, big_f, lp, x, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_moe_engine_e2e_int4():
    from nanovllm_tpu import LLM, SamplingParams as SP

    cfg, _ = make_tiny_moe()
    llm = LLM(cfg, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
              num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
              prefill_chunk=16, dtype="float32", attention_backend="jnp",
              warmup=False, quantization="int4")
    assert llm.model_runner.params["layers"]["w_gate_up"].dtype == jnp.int8
    rng = np.random.default_rng(6)
    out = llm.generate([list(rng.integers(1, 127, size=12))],
                       SP(temperature=0.0, max_tokens=6, ignore_eos=True),
                       use_tqdm=False)
    assert len(out[0]["token_ids"]) == 6
