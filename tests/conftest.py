"""Test harness: run everything on CPU with 8 virtual devices so sharding
tests exercise a real mesh without TPU hardware.

The ambient environment pins jax to the TPU plugin in a way that ignores
JAX_PLATFORMS, so we also force the platform through jax.config (fp32 matmuls
on TPU run at bf16 precision and would break parity tolerances).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
