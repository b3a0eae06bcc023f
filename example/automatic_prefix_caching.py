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
        from bench_model import qwen3_0_6b_config

        llm = LLM(qwen3_0_6b_config(), max_num_seqs=8, max_model_len=2048)
        random.seed(0)
        prompts = [[random.randint(1, 10000) for _ in range(900)]]

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
