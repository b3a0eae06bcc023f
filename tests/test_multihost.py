"""Multi-host engine: 2 processes x 4 virtual CPU devices, one global tp=8
mesh over jax.distributed (gloo collectives), NO control-plane RPC — each
process runs the full LLMEngine on the same requests and must produce
bit-identical outputs (parallel/multihost.py design; the reference needs a
SHM RPC channel for the same guarantee, reference model_runner.py:91-193).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

from nanovllm_tpu.parallel import multihost
multihost.init(coordinator_address="127.0.0.1:" + port,
               num_processes=nproc, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from transformers import Qwen3Config
from nanovllm_tpu import LLM, SamplingParams

cfg = Qwen3Config(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
    head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
    architectures=["Qwen3ForCausalLM"],
)
llm = LLM(cfg, tensor_parallel_size=8, max_num_seqs=4, max_model_len=128,
          kvcache_block_size=16, num_kvcache_blocks=64,
          prefill_token_buckets=(64, 128), prefill_chunk=16, dtype="float32",
          attention_backend="jnp", warmup=False)
rng = np.random.default_rng(21)
prompts = [list(rng.integers(1, 127, size=int(n))) for n in (9, 23, 35)]
sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
outs = llm.generate(prompts, sp, use_tqdm=False)
with open(out_path, "w") as f:
    json.dump([o["token_ids"] for o in outs], f)
print("worker", pid, "done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_engine_identical(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    procs = []
    outs = [tmp_path / f"out_{i}.json" for i in range(2)]
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(i), "2", str(port), str(outs[i])],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    res = [json.loads(o.read_text()) for o in outs]
    # identical across hosts
    assert res[0] == res[1]
    assert all(len(t) == 8 for t in res[0])

    # and identical to a single-process run of the same model (the parent
    # pytest process has 8 virtual devices; greedy + float32 so tp grouping
    # cannot change the argmax).
    from transformers import Qwen3Config

    from nanovllm_tpu import LLM, SamplingParams

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
        architectures=["Qwen3ForCausalLM"],
    )
    llm = LLM(cfg, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
              num_kvcache_blocks=64, prefill_token_buckets=(64, 128),
              prefill_chunk=16, dtype="float32", attention_backend="jnp",
              warmup=False)
    rng = np.random.default_rng(21)
    prompts = [list(rng.integers(1, 127, size=int(n))) for n in (9, 23, 35)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    single = [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]
    assert single == res[0]
