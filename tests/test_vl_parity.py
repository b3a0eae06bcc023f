"""Qwen3-VL parity vs HuggingFace transformers on CPU: vision tower outputs,
mrope positions, and full multimodal prefill logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.models import qwen3_vl as vl
from nanovllm_tpu.utils.loader import load_vl_params

IMG_TOKEN = 155


def make_tiny_vl():
    import torch
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLTextConfig, Qwen3VLVisionConfig)

    vc = Qwen3VLVisionConfig(
        depth=3, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=48, num_position_embeddings=16,
        deepstack_visual_indexes=[0, 1])
    tc = Qwen3VLTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                      "mrope_interleaved": True})
    cfg = Qwen3VLConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                        image_token_id=IMG_TOKEN, video_token_id=156,
                        vision_start_token_id=157, vision_end_token_id=158)
    cfg.architectures = ["Qwen3VLForConditionalGeneration"]
    torch.manual_seed(0)
    return cfg, Qwen3VLForConditionalGeneration(cfg).eval()


GRID = (1, 4, 4)  # 16 patches -> 4 merged tokens
PATCH_DIM = 3 * 2 * 4 * 4


def test_vision_tower_parity():
    import torch

    cfg, model = make_tiny_vl()
    spec = vl.spec_from_hf(cfg, max_model_len=128)
    params = load_vl_params(spec, model.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((np.prod(GRID), PATCH_DIM)).astype(np.float32)
    grid_t = torch.tensor([list(GRID)])
    with torch.no_grad():
        hf_merged, hf_ds = model.model.visual(torch.tensor(pixels), grid_t)

    merged, ds = vl.encode_image(spec.vision, params["vision"],
                                 jnp.asarray(pixels), GRID)
    np.testing.assert_allclose(np.asarray(merged), hf_merged.float().numpy(),
                               rtol=2e-4, atol=2e-4)
    assert len(hf_ds) == ds.shape[0] == 2
    for j in range(2):
        np.testing.assert_allclose(np.asarray(ds[j]), hf_ds[j].float().numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_mrope_positions_match_hf():
    import torch

    cfg, model = make_tiny_vl()
    spec = vl.spec_from_hf(cfg, max_model_len=128)
    n_img_tokens = 4  # merged tokens
    # vision_start (157) must precede the image span for HF's detection
    ids = [1, 2, 157] + [IMG_TOKEN] * n_img_tokens + [158, 5]
    pos_hf, delta = model.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor([list(GRID)]))
    pos_hf = pos_hf[:, 0].numpy()  # (3, len)

    ours, nxt = vl.compute_mrope_positions(
        ids, [(3, n_img_tokens)], [GRID], spec.vision.spatial_merge_size)
    np.testing.assert_array_equal(ours, pos_hf)
    assert nxt == int(pos_hf.max()) + 1 + 0  # next position continues from max


def test_full_multimodal_prefill_parity():
    import torch

    cfg, model = make_tiny_vl()
    spec = vl.spec_from_hf(cfg, max_model_len=128)
    params = load_vl_params(spec, model.state_dict(), dtype=jnp.float32)

    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((np.prod(GRID), PATCH_DIM)).astype(np.float32)
    n_img = 4
    ids = [1, 2, 157] + [IMG_TOKEN] * n_img + [158, 5]
    T = len(ids)

    with torch.no_grad():
        hf_logits = model(input_ids=torch.tensor([ids]),
                          pixel_values=torch.tensor(pixels),
                          image_grid_thw=torch.tensor([list(GRID)])
                          ).logits[0].float().numpy()

    # engine-style prefill: paged cache, full suffix, extras
    from nanovllm_tpu.ops.attention import AttnMeta, KVCache

    merged, ds = vl.encode_image(spec.vision, params["vision"],
                                 jnp.asarray(pixels), GRID)
    mm_embeds = np.zeros((T, spec.text.hidden_size), np.float32)
    visual_mask = np.zeros((T,), bool)
    deepstack = np.zeros((2, T, spec.text.hidden_size), np.float32)
    mm_embeds[3:3 + n_img] = np.asarray(merged)
    visual_mask[3:3 + n_img] = True
    deepstack[:, 3:3 + n_img] = np.asarray(ds)
    pos3, _ = vl.compute_mrope_positions(ids, [(3, n_img)], [GRID],
                                         spec.vision.spatial_merge_size)

    bs_, nblocks = 16, 8
    tables = np.zeros((2, 8), np.int32)
    tables[0, :1] = 1
    meta = AttnMeta(
        seg_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.asarray(bs_ + np.arange(T, dtype=np.int32)),
        block_tables=jnp.asarray(tables),
        context_lens=jnp.asarray([T, 0], dtype=jnp.int32),
        last_token_idx=jnp.arange(2, dtype=jnp.int32) * 0 + jnp.asarray([T - 1, 0]),
        chunk_seg=jnp.zeros(1, jnp.int32),
        num_seqs=jnp.asarray(1))
    cache = KVCache.zeros(spec.text.num_layers, nblocks, bs_,
                          spec.text.num_kv_heads, spec.text.head_dim,
                          jnp.float32)
    extras = {"mm_embeds": jnp.asarray(mm_embeds),
              "visual_mask": jnp.asarray(visual_mask),
              "deepstack": jnp.asarray(deepstack),
              "mrope_pos": jnp.asarray(pos3)}
    hidden, cache = vl.text_forward(spec, params, jnp.asarray(ids, dtype=jnp.int32),
                                    meta, cache, extras=extras)
    from nanovllm_tpu.models import dense

    logits = np.asarray(dense.compute_logits(spec.text, params, hidden))
    np.testing.assert_allclose(logits[0], hf_logits[-1], rtol=3e-4, atol=3e-4)


def test_engine_multimodal_e2e():
    """Full engine path: generate_multimodal with pre-processed inputs; the
    first greedy tokens must match HF generate on the same tiny model."""
    import torch

    from nanovllm_tpu import LLM, SamplingParams

    cfg, model = make_tiny_vl()
    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((np.prod(GRID), PATCH_DIM)).astype(np.float32)
    ids = [1, 2, 157] + [IMG_TOKEN] * 4 + [158, 5]

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor([list(GRID)]), max_new_tokens=3,
            do_sample=False)
    hf_tokens = hf_out[0, len(ids):].tolist()

    llm = LLM(cfg, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
              num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
              prefill_chunk=16, dtype="float32", attention_backend="jnp",
              warmup=False)
    # inject the HF weights
    from nanovllm_tpu.utils.loader import load_vl_params

    llm.model_runner.params = load_vl_params(
        llm.model_runner.adapter.spec, model.state_dict(), dtype=jnp.float32)
    llm.model_runner.adapter.params = llm.model_runner.params

    out = llm.generate_multimodal(
        [{"input_ids": ids, "pixel_values": pixels,
          "image_grid_thw": [GRID]}],
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True))
    assert out[0]["token_ids"] == hf_tokens


def test_engine_multimodal_chunked_windows():
    """Chunked prefill over a multimodal prompt: force multiple 16-token
    windows so the vision placeholder run is split across windows (the
    vision-slice streaming path in VLAdapter.prepare_extras) — greedy
    outputs must match HF exactly, and match the unchunked engine."""
    import torch

    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.utils.loader import load_vl_params

    cfg, model = make_tiny_vl()
    rng = np.random.default_rng(5)
    pixels = rng.standard_normal((np.prod(GRID), PATCH_DIM)).astype(np.float32)
    # long prompt: text, a 4-token image straddling a window boundary, text
    ids = ([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]
           + [157] + [IMG_TOKEN] * 4 + [158]
           + list(range(20, 50)))

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor([list(GRID)]), max_new_tokens=3,
            do_sample=False)
    hf_tokens = hf_out[0, len(ids):].tolist()

    def run(step_tokens):
        llm = LLM(cfg, max_num_seqs=4, max_model_len=128,
                  kvcache_block_size=16, num_kvcache_blocks=64,
                  prefill_token_buckets=(16, 32, 64, 128), prefill_chunk=16,
                  prefill_step_tokens=step_tokens, dtype="float32",
                  attention_backend="jnp", warmup=False)
        assert llm.config.chunked_prefill  # VL no longer disables it
        llm.model_runner.params = load_vl_params(
            llm.model_runner.adapter.spec, model.state_dict(),
            dtype=jnp.float32)
        llm.model_runner.adapter.params = llm.model_runner.params
        out = llm.generate_multimodal(
            [{"input_ids": ids, "pixel_values": pixels,
              "image_grid_thw": [GRID]}],
            SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True))
        return out[0]["token_ids"]

    assert run(16) == hf_tokens      # 4 windows: image split across windows
    assert run(2048) == hf_tokens    # single window (control)


def test_engine_multimodal_concurrent_mixed_steps():
    """Two concurrent VL requests of different lengths: the short one starts
    decoding while the long one is still prefilling in 16-token windows, so
    the engine takes MIXED steps through dispatch_plan. Regression for the
    round-2 bugs: dispatch_plan dropped n_prefill (prefill windows were
    treated as decode lanes — no vision embeds, wrong mrope) and the decode
    branch wrote mrope positions at the slot index instead of the token row.
    Both outputs must match HF greedy decoding run separately."""
    import torch

    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.utils.loader import load_vl_params

    cfg, model = make_tiny_vl()
    rng = np.random.default_rng(7)
    pix_a = rng.standard_normal((np.prod(GRID), PATCH_DIM)).astype(np.float32)
    pix_b = rng.standard_normal((np.prod(GRID), PATCH_DIM)).astype(np.float32)
    ids_a = [1, 2, 157] + [IMG_TOKEN] * 4 + [158, 5]          # 9 tokens
    ids_b = ([9, 8, 7, 6, 5, 4, 3, 2, 1, 10, 11, 12, 13]
             + [157] + [IMG_TOKEN] * 4 + [158]
             + list(range(30, 60)))                            # 49 tokens

    def hf_greedy(ids, pixels, n):
        with torch.no_grad():
            out = model.generate(
                input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(pixels),
                image_grid_thw=torch.tensor([list(GRID)]),
                max_new_tokens=n, do_sample=False)
        return out[0, len(ids):].tolist()

    hf_a = hf_greedy(ids_a, pix_a, 8)
    hf_b = hf_greedy(ids_b, pix_b, 8)

    llm = LLM(cfg, max_num_seqs=4, max_model_len=128,
              kvcache_block_size=16, num_kvcache_blocks=64,
              prefill_token_buckets=(16, 32, 64, 128), prefill_chunk=16,
              prefill_step_tokens=16, dtype="float32",
              attention_backend="jnp", warmup=False)
    # Multimodal now keeps BOTH chunked prefill and the async-decode chain
    # on (decode mrope positions are precomputed from the batch's virtual
    # position), so this exercises mixed steps + chaining against HF greedy.
    assert llm.config.chunked_prefill and llm.config.async_decode
    llm.model_runner.params = load_vl_params(
        llm.model_runner.adapter.spec, model.state_dict(), dtype=jnp.float32)
    llm.model_runner.adapter.params = llm.model_runner.params

    out = llm.generate_multimodal(
        [{"input_ids": ids_a, "pixel_values": pix_a, "image_grid_thw": [GRID]},
         {"input_ids": ids_b, "pixel_values": pix_b, "image_grid_thw": [GRID]}],
        [SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
         SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)])
    assert out[0]["token_ids"] == hf_a
    assert out[1]["token_ids"] == hf_b


def test_video_generate_matches_hf():
    """Video inputs end-to-end: per-frame placeholder runs (timestamp
    tokens separate frames), whole-grid tower encode split into per-frame
    chunks, per-frame (1,h,w) mrope grids — greedy tokens must match HF
    (which has native video support; the REFERENCE engine has none)."""
    import torch

    from nanovllm_tpu import LLM, SamplingParams

    cfg, model = make_tiny_vl()
    VID = 156
    rng = np.random.default_rng(21)
    vgrid = (2, 4, 4)  # 2 temporal patches -> 2 frames of 4 merged tokens
    pix = (rng.standard_normal((int(np.prod(vgrid)), PATCH_DIM))
           .astype(np.float32) * 0.5)
    ids = ([1, 2, 157] + [VID] * 4 + [158, 9, 157] + [VID] * 4 + [158, 5]
           + list(range(20, 30)))
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=torch.tensor(pix),
            video_grid_thw=torch.tensor([list(vgrid)]),
            max_new_tokens=8, do_sample=False)
    hf = out[0, len(ids):].tolist()

    llm = LLM(cfg, max_num_seqs=4, max_model_len=128,
              kvcache_block_size=16, num_kvcache_blocks=64,
              prefill_token_buckets=(32, 64, 128), prefill_chunk=16,
              dtype="float32", attention_backend="jnp", warmup=False)
    llm.model_runner.params = load_vl_params(
        llm.model_runner.adapter.spec, model.state_dict(), dtype=jnp.float32)
    llm.model_runner.adapter.params = llm.model_runner.params
    res = llm.generate_multimodal(
        [{"input_ids": ids, "pixel_values_videos": pix,
          "video_grid_thw": [vgrid]}],
        [SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)])
    assert res[0]["token_ids"] == hf


def test_video_and_image_mixed_request():
    """An image and a video in one prompt: span-ordered grid/pixel merge."""
    import torch

    from nanovllm_tpu import LLM, SamplingParams

    cfg, model = make_tiny_vl()
    VID = 156
    rng = np.random.default_rng(22)
    vgrid = (2, 4, 4)
    igrid = (1, 4, 4)
    ipix = (rng.standard_normal((int(np.prod(igrid)), PATCH_DIM))
            .astype(np.float32) * 0.5)
    vpix = (rng.standard_normal((int(np.prod(vgrid)), PATCH_DIM))
            .astype(np.float32) * 0.5)
    ids = ([1, 157] + [IMG_TOKEN] * 4 + [158, 7, 157] + [VID] * 4
           + [158, 9, 157] + [VID] * 4 + [158] + list(range(30, 40)))
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(ipix),
            image_grid_thw=torch.tensor([list(igrid)]),
            pixel_values_videos=torch.tensor(vpix),
            video_grid_thw=torch.tensor([list(vgrid)]),
            max_new_tokens=6, do_sample=False)
    hf = out[0, len(ids):].tolist()

    llm = LLM(cfg, max_num_seqs=4, max_model_len=128,
              kvcache_block_size=16, num_kvcache_blocks=64,
              prefill_token_buckets=(32, 64, 128), prefill_chunk=16,
              dtype="float32", attention_backend="jnp", warmup=False)
    llm.model_runner.params = load_vl_params(
        llm.model_runner.adapter.spec, model.state_dict(), dtype=jnp.float32)
    llm.model_runner.adapter.params = llm.model_runner.params
    res = llm.generate_multimodal(
        [{"input_ids": ids, "pixel_values": ipix, "image_grid_thw": [igrid],
          "pixel_values_videos": vpix, "video_grid_thw": [vgrid]}],
        [SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)])
    assert res[0]["token_ids"] == hf
