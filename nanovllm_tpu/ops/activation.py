"""SwiGLU activation over a fused gate|up tensor.

Parity target: reference nanovllm/layers/activation.py:6-13.
"""

import jax
import jax.numpy as jnp


def silu_and_mul(gate_up):
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up
