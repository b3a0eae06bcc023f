"""Multimodal generation example (reference example/example_multimodal.py).

With a real checkpoint + images:
    python example/example_multimodal.py --model /path/to/Qwen3-VL-2B-Instruct \
        --image photo.jpg --prompt "Describe this image."
Demo mode (no checkpoint): runs a tiny random-weight Qwen3-VL on random
pixels with pre-expanded token ids.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nanovllm_tpu import LLM, SamplingParams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    parser.add_argument("--image", default=None)
    parser.add_argument("--prompt", default="Describe this image.")
    args = parser.parse_args()

    if args.model:
        from transformers import AutoProcessor
        from PIL import Image

        processor = AutoProcessor.from_pretrained(args.model)
        llm = LLM(args.model, max_num_seqs=8, max_model_len=4096)
        image = Image.open(args.image) if args.image else None
        reqs = [{"prompt": args.prompt, "images": [image] if image else []}]
        out = llm.generate_multimodal(reqs, SamplingParams(temperature=0.6,
                                                           max_tokens=128),
                                      processor=processor)
    else:
        from transformers import Qwen3VLConfig
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
            head_dim=16, max_position_embeddings=128,
            rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True})
        cfg = Qwen3VLConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                            image_token_id=155, video_token_id=156,
                            vision_start_token_id=157, vision_end_token_id=158)
        cfg.architectures = ["Qwen3VLForConditionalGeneration"]
        llm = LLM(cfg, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
                  num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
                  prefill_chunk=16, dtype="float32", warmup=False)
        rng = np.random.default_rng(0)
        grid = (1, 4, 4)
        pixels = rng.standard_normal((16, 96)).astype(np.float32)
        ids = [1, 2, 157] + [155] * 4 + [158, 5]
        out = llm.generate_multimodal(
            [{"input_ids": ids, "pixel_values": pixels,
              "image_grid_thw": [grid]}],
            SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True))
    for o in out:
        print("completion:", o["text"] if o["text"] is not None else o["token_ids"])


if __name__ == "__main__":
    main()
