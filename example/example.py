"""Batch text generation example (reference example/example.py).

With a real checkpoint:   python example/example.py --model /path/to/Qwen3-0.6B
Without one (demo mode):  python example/example.py
  (random-weight Qwen3-0.6B; prompts are token ids and outputs are token ids)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanovllm_tpu import LLM, SamplingParams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None, help="HF checkpoint dir")
    parser.add_argument("--max-tokens", type=int, default=128)
    args = parser.parse_args()

    if args.model:
        llm = LLM(args.model, max_num_seqs=16, max_model_len=4096)
        prompts = [
            "who are you?",
            "9.11 and 9.8, which is greater?",
            "Tell me a joke.",
        ]
        if llm.tokenizer is not None and llm.tokenizer.chat_template:
            prompts = [
                llm.tokenizer.apply_chat_template(
                    [{"role": "user", "content": p}],
                    tokenize=False, add_generation_prompt=True)
                for p in prompts
            ]
    else:
        from transformers import Qwen3Config

        demo = Qwen3Config(
            vocab_size=8192, hidden_size=256, intermediate_size=768,
            num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
            head_dim=64, max_position_embeddings=1024, tie_word_embeddings=True,
            architectures=["Qwen3ForCausalLM"])
        llm = LLM(demo, max_num_seqs=16, max_model_len=512,
                  max_num_batched_tokens=512, prefill_token_buckets=(512,),
                  warmup=False)
        import random

        random.seed(0)
        prompts = [[random.randint(1, 8000) for _ in range(32)] for _ in range(3)]

    sp = SamplingParams(temperature=0.6, max_tokens=args.max_tokens)
    outputs = llm.generate(prompts, sp)
    for prompt, out in zip(prompts, outputs):
        print("=" * 60)
        print("prompt:", str(prompt)[:120])
        print("completion:", out["text"] if out["text"] is not None
              else out["token_ids"])


if __name__ == "__main__":
    main()
