"""Automatic prefix caching demo (reference example/automatic_prefix_caching.py).

Sends the same long prompt twice: the second generation reuses the cached
KV pages ("cache_tokens" in the output) and prefills only the tail.
"""

import argparse
import random
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanovllm_tpu import LLM, SamplingParams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    args = parser.parse_args()

    if args.model:
        llm = LLM(args.model, max_num_seqs=8, max_model_len=4096)
        long_prompt = "You are an expert assistant. " * 100 + "What is 2+2?"
        prompts = [long_prompt]
    else:
        from transformers import Qwen3Config

        demo = Qwen3Config(
            vocab_size=8192, hidden_size=256, intermediate_size=768,
            num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
            head_dim=64, max_position_embeddings=2048, tie_word_embeddings=True,
            architectures=["Qwen3ForCausalLM"])
        llm = LLM(demo, max_num_seqs=8, max_model_len=2048,
                  max_num_batched_tokens=2048, prefill_token_buckets=(1024, 2048),
                  warmup=False)
        random.seed(0)
        prompts = [[random.randint(1, 8000) for _ in range(900)]]

    sp = SamplingParams(temperature=0.0, max_tokens=32)

    out1 = llm.generate(prompts, sp, use_tqdm=False)
    print(f"first pass:  cache_tokens={out1[0]['cache_tokens']}")
    out2 = llm.generate(prompts, sp, use_tqdm=False)
    print(f"second pass: cache_tokens={out2[0]['cache_tokens']} "
          f"(prefix served from cache)")
    assert out2[0]["cache_tokens"] > 0
    assert out1[0]["token_ids"] == out2[0]["token_ids"], "greedy must be stable"
    print("outputs identical across passes")


if __name__ == "__main__":
    main()
