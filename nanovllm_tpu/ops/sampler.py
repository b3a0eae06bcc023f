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


def sample_tokens_filtered(logits, temperatures, top_k, top_p, key):
    """Temperature + per-sequence top-k / top-p (nucleus) sampling.

    top_k: (S,) int32, 0 disables; top_p: (S,) float32, 1.0 disables.
    One descending sort serves both filters; sampling is gumbel-max over the
    masked logits. Used only when a batch requests filtering (the plain
    sampler avoids the (S, V) sort entirely).
    """
    logits = logits.astype(jnp.float32)
    S, V = logits.shape
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)

    # top-k: threshold at the k-th largest value
    k = jnp.where(top_k > 0, top_k, V).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_logits,
                              jnp.clip(k - 1, 0, V - 1)[:, None], axis=-1)
    keep_k = logits >= kth

    # top-p: keep the smallest prefix of the sorted distribution with
    # cumulative probability >= p (always keeping the argmax)
    probs = jax.nn.softmax(sorted_logits / jnp.maximum(temperatures, 1e-10)[:, None],
                           axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_p[:, None]
    keep_sorted = keep_sorted.at[:, 0].set(True)
    keep_p = jnp.zeros_like(keep_k).at[
        jnp.arange(S)[:, None], order].set(keep_sorted)

    masked = jnp.where(keep_k & keep_p, logits, -jnp.inf)
    return sample_tokens(masked, temperatures, key)
