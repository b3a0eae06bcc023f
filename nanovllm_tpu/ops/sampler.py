"""In-jit token sampling.

Parity target: reference nanovllm/layers/sampler.py:8-17 (temperature-scaled
multinomial, padded-lane truncation) — extended with exact greedy decoding at
temperature 0 (the reference forbids it) via the gumbel-max trick, which keeps
the whole sampler branch-free and jittable.
"""

import jax
import jax.numpy as jnp


def sample_tokens(logits, temperatures, key):
    """logits: (S, V) float32; temperatures: (S,); returns (S,) int32 tokens.

    temperature == 0 -> argmax (greedy); otherwise gumbel-max multinomial of
    softmax(logits / T), which is exactly categorical sampling.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temps = jnp.maximum(temperatures, 1e-10)[:, None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    sampled = jnp.argmax(logits / temps + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperatures <= 0.0, greedy, sampled)
