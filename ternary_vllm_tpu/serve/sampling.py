"""Token sampling: greedy / temperature / top-k / top-p, jit-safe.

The reference only does greedy argmax (reference ``test_tflite.py:208``);
temperature/top-k/top-p are standard serving capabilities added for the
engine (static-shape implementations: top-k via ``lax.top_k``, top-p via
sorted-cumsum masking — no data-dependent shapes under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_token(
    logits,
    key=None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """logits (..., V) → token ids (...,) int32.

    ``temperature==0`` (or no key) = greedy argmax.
    """
    if temperature == 0.0 or key is None:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep the top-1)
        cutoff_idx = jnp.sum((cum - probs) < top_p, axis=-1, keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_logits, jnp.maximum(cutoff_idx, 0), axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
