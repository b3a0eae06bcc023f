"""Offline throughput benchmark — the reference's bench/bench.py workload:
256 sequences, input 100-1024 tokens, output 100-1024 tokens, temperature
0.6, ignore_eos (reference bench/bench.py:16-39, README.md:427-432).

No model weights ship in this environment, so the model is a Qwen3-0.6B-
shaped network with random weights — identical compute/memory profile to the
real checkpoint, which is what throughput measures.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference's published Qwen3-0.6B number
(3904.20 tok/s on an Atlas A3 910C NPU, reference README.md:315).
"""

import argparse
import json
import logging
import os
import sys
import threading
import time
from random import randint, seed


# Reference's published numbers (README.md:313-320, Atlas A3 910C NPU).
# qwen3-30b-a3b has no direct reference row: the baseline is DERIVED as the
# reference's per-chip rate on its largest demonstrated model, Qwen3-32B at
# TP=2 (695.59 tok/s / 2 chips, README.md:319) — our row runs a BIGGER-class
# MoE on ONE 16 GB chip (int4, quantized_init).
BASELINES = {
    "qwen3-0.6b": 3904.20,
    "qwen2-0.5b": 6940.84,
    "llama3.2-1b": 5648.50,
    "qwen3-30b-a3b": 347.80,
    # the reference publishes no MiniCPM or VL numbers (mini_cpm4.py /
    # qwen3_vl.py have no bench rows); vs_baseline is omitted for them
    "minicpm4-0.5b": None,
    "qwen3-vl": None,
}
BASELINE_QWEN3_0_6B = BASELINES["qwen3-0.6b"]


from bench_model import (llama32_1b_config, minicpm4_0_5b_config,  # noqa: E402
                         qwen2_0_5b_config, qwen3_0_6b_config,
                         qwen3_30b_a3b_config, qwen3_vl_config)

FAMILIES = {
    "qwen3-0.6b": qwen3_0_6b_config,
    "qwen2-0.5b": qwen2_0_5b_config,
    "llama3.2-1b": llama32_1b_config,
    "qwen3-30b-a3b": qwen3_30b_a3b_config,
    "minicpm4-0.5b": minicpm4_0_5b_config,
    "qwen3-vl": qwen3_vl_config,
}

# Engine/workload overrides for families that need them (30B-class on a
# 16 GB chip: ~16 GB of packed weights leaves ~1 GB for the KV pool).
FAMILY_OVERRIDES = {
    # 14.5 GiB of packed int4 experts leave ~1 GiB on a 15.75 GiB chip:
    # 16 lanes x 2 pages (+dummy+slack) of KV and bf16 wide-group expert
    # scales (the first real run OOMed by 1 GiB with f32 group-128 scales
    # and 82 KV blocks — BUILD_NOTES round 4).
    "qwen3-30b-a3b": dict(
        num_seqs=48, max_input_len=224, max_output_len=256,
        max_num_seqs=24, max_model_len=512, max_num_batched_tokens=2048,
        quantization="int4",
        extra=dict(quantized_init=True, num_kvcache_blocks=50,
                   prefill_step_tokens=512, gpu_memory_utilization=0.98),
    ),
    # Multimodal: every request carries one image (grid 1x16x16 = 256
    # patches -> 64 merged vision tokens through the tower + DeepStack).
    # The workload is mixed vision+text prefill plus decode — the chip run
    # the VL stack never had (VERDICT r4 #3).
    "qwen3-vl": dict(
        num_seqs=64, max_input_len=512, max_output_len=256,
        max_num_seqs=64, max_model_len=1024,
    ),
}

VL_GRID = (1, 16, 16)  # 256 patches -> 64 merged tokens per image


def make_vl_requests(cfg, num_seqs, max_input_len, rng):
    """Pre-expanded multimodal requests: [vision_start, 64 x image_token,
    vision_end] spliced into random text ids, with random pixels."""
    import numpy as np

    t, h, w = VL_GRID
    merge = cfg.vision_config.spatial_merge_size
    n_vis = t * h * w // (merge * merge)
    pin = (3 * cfg.vision_config.temporal_patch_size
           * cfg.vision_config.patch_size ** 2)
    special = {cfg.image_token_id, cfg.video_token_id,
               cfg.vision_start_token_id, cfg.vision_end_token_id}

    def text(n):
        return [int(x) if int(x) not in special else 1
                for x in rng.integers(0, 10000, size=n)]

    reqs = []
    for _ in range(num_seqs):
        n_text = rng.integers(max(100, max_input_len // 2), max_input_len)
        pre = int(rng.integers(1, max(2, n_text // 2)))
        ids = (text(pre)
               + [cfg.vision_start_token_id]
               + [cfg.image_token_id] * n_vis
               + [cfg.vision_end_token_id]
               + text(int(n_text) - pre))
        pixels = rng.standard_normal((t * h * w, pin)).astype(np.float32)
        reqs.append({"input_ids": ids, "pixel_values": pixels,
                     "image_grid_thw": [VL_GRID]})
    return reqs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None, help="HF checkpoint dir (default: random-weight --family)")
    parser.add_argument("--family", default="qwen3-0.6b", choices=sorted(FAMILIES),
                        help="random-weight architecture when --model is not given")
    parser.add_argument("--num-seqs", type=int, default=256)
    parser.add_argument("--max-input-len", type=int, default=1024)
    parser.add_argument("--max-output-len", type=int, default=1024)
    parser.add_argument("--max-num-seqs", type=int, default=192)
    parser.add_argument("--max-model-len", type=int, default=2048)
    parser.add_argument("--max-num-batched-tokens", type=int, default=4096)
    parser.add_argument("--block-size", type=int, default=256)
    parser.add_argument("--kv-cache-dtype", default="int8")
    parser.add_argument("--quantization", default="int8")
    parser.add_argument("--attention-backend", default="auto")
    parser.add_argument("--use-shard-map", default="auto",
                        help="'on': run the step under shard_map on a 1-device mesh")
    parser.add_argument("--smoke", action="store_true", help="tiny quick run")
    parser.add_argument("--phase-stats", action="store_true",
                        help="per-phase step accounting (prefill/mixed vs decode)")
    parser.add_argument("--seed", type=int, default=0,
                        help="engine sampler seed (baked into the step HLO: "
                             "a fresh seed also forces genuinely cold "
                             "compiles — used by tools/cold_start_check.sh)")
    parser.add_argument("--max-warmup-secs", type=float,
                        default=float(os.environ.get(
                            "NANOVLLM_MAX_WARMUP_SECS", 0)),
                        help="fail loudly (exit 3) if engine init + warmup "
                             "exceeds this budget; 0 disables")
    args = parser.parse_args()

    # Warmup/compile progress goes to STDERR (stdout carries only the JSON
    # result line): round 4's driver run timed out after an 11-minute
    # SILENT cold-cache warmup — indistinguishable from a hang.
    logging.basicConfig(
        stream=sys.stderr, level=logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
        datefmt="%H:%M:%S")

    from nanovllm_tpu import LLM, SamplingParams

    seed(0)
    extra = {}
    if not args.model and args.family in FAMILY_OVERRIDES:
        over = dict(FAMILY_OVERRIDES[args.family])
        extra = over.pop("extra", {})
        for key, value in over.items():
            setattr(args, key, value)
    if args.smoke:
        args.num_seqs, args.max_input_len, args.max_output_len = 8, 64, 32
        args.max_num_seqs = 8
        # Smoke keeps a small fixed page pool: sizing the cache to 70% of
        # HBM leaves no headroom for the jnp debug backend's cache gathers
        # (which cost a second copy) on a 16 GB chip.
        extra["num_kvcache_blocks"] = 64

    model = args.model or FAMILIES[args.family]()
    watchdog = None
    if args.max_warmup_secs > 0:
        def _abort():
            print(f"FATAL: engine init + warmup exceeded the "
                  f"{args.max_warmup_secs:.0f}s budget "
                  f"(cold compile cache?)", file=sys.stderr, flush=True)
            os._exit(3)
        watchdog = threading.Timer(args.max_warmup_secs, _abort)
        watchdog.daemon = True
        watchdog.start()
    llm = LLM(
        model,
        max_num_seqs=args.max_num_seqs,
        max_model_len=args.max_model_len,
        max_num_batched_tokens=args.max_num_batched_tokens,
        kvcache_block_size=args.block_size,
        kv_cache_dtype=args.kv_cache_dtype,
        quantization=args.quantization,
        attention_backend=args.attention_backend,
        use_shard_map=args.use_shard_map,
        seed=args.seed,
        # The offline workload samples with temperature only — the filtered
        # (top-k/top-p) jit variants would double cold-start compiles.
        warmup_filtered="off",
        **extra,
    )

    multimodal = llm.config.is_multimodal and not args.model
    in_lo = min(100, max(args.max_input_len // 2, 1))
    out_lo = min(100, max(args.max_output_len // 2, 1))
    sps = [SamplingParams(temperature=0.6, ignore_eos=True,
                          max_tokens=randint(out_lo, args.max_output_len))
           for _ in range(args.num_seqs)]
    if multimodal:
        import numpy as np
        rng = np.random.default_rng(0)
        requests = make_vl_requests(llm.config.hf_config, args.num_seqs,
                                    args.max_input_len, rng)
        # vision tower alone: one image through the engine's jitted encoder
        # (registry.VLAdapter._ensure_vision uses the same jit)
        import functools

        import jax
        adapter = llm.model_runner.adapter
        jenc = jax.jit(functools.partial(
            adapter.vlmod.encode_image, adapter.spec.vision, grid=VL_GRID))
        px = jax.numpy.asarray(requests[0]["pixel_values"])
        jax.block_until_ready(jenc(adapter.params["vision"], px))  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            out = jenc(adapter.params["vision"], px)
        jax.block_until_ready(out)
        vision_ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"vision encode (grid {VL_GRID}): {vision_ms:.2f} ms/image",
              file=sys.stderr)
    else:
        prompts = [[randint(0, 10000)
                    for _ in range(randint(in_lo, args.max_input_len))]
                   for _ in range(args.num_seqs)]

    # tiny warm run (jit shapes already compiled by engine warmup)
    llm.generate([[randint(0, 10000) for _ in range(32)]],
                 SamplingParams(max_tokens=8, ignore_eos=True), use_tqdm=False)
    if watchdog is not None:
        watchdog.cancel()

    t = time.time()
    if multimodal:
        llm.generate_multimodal(requests, sps, use_tqdm=False)
    elif args.phase_stats:
        # step() loop with per-phase accounting instead of generate().
        for p, sp in zip(prompts, sps):
            llm.add_request(p, sp)
        stats = {}  # phase -> [steps, seconds, tokens]
        while not llm.is_finished():
            t0 = time.perf_counter()
            _, ntok = llm.step()
            dt0 = time.perf_counter() - t0
            phase = "decode" if ntok < 0 else "prefill/mixed"
            st = stats.setdefault(phase, [0, 0.0, 0])
            st[0] += 1
            st[1] += dt0
            st[2] += abs(ntok)
        for phase, (n, secs, toks) in sorted(stats.items()):
            print(f"[phase {phase}] {n} steps, {secs:.1f}s "
                  f"({secs/max(n,1)*1e3:.1f} ms/step), {toks} tokens "
                  f"({toks/max(secs,1e-9):.0f} tok/s)", file=sys.stderr)
    else:
        llm.generate(prompts, sps, use_tqdm=False)
    dt = time.time() - t
    total_tokens = sum(sp.max_tokens for sp in sps)
    throughput = total_tokens / dt
    print(f"Total: {total_tokens}tok, Time: {dt:.2f}s, "
          f"Throughput: {throughput:.2f}tok/s", file=sys.stderr)
    record = {
        "metric": f"{args.family.replace('-', '_')}_offline_throughput",
        "value": round(throughput, 2),
        "unit": "tok/s",
    }
    if BASELINES.get(args.family):
        record["vs_baseline"] = round(throughput / BASELINES[args.family], 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
