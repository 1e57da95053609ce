"""Autoregressive decode: bucketed prefill + fused on-device decode loop.

Capability parity with the reference's inference harness
(reference ``test_tflite.py:152-219``: per-token ``predict`` + greedy
``inference_loop`` printing tokens/sec), re-designed TPU-first:

* The reference resizes interpreter tensors and re-allocates every step
  (``test_tflite.py:171-173``) and round-trips the whole growing KV cache
  through host memory per token.  Here the cache is a fixed-capacity on-device
  buffer and the whole decode loop is a single ``lax.while_loop`` under one
  ``jit`` — zero host↔device traffic per token, one compiled program.
* Prefill lengths are bucketed (powers of two) so a handful of compilations
  cover all prompt lengths; zero-padded tail positions are harmless because
  every later token overwrites its own cache slot before it is ever attended.
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.serve.sampling import sample_token


def _bucket(t: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if t <= b:
            return b
    return t


@functools.partial(jax.jit, donate_argnums=(0,))
def _transpose_cache_jit(cache):
    return phi.transpose_cache(cache)


@functools.partial(jax.jit, static_argnames=("config", "specs"), donate_argnums=(3,))
def prefill(params, config, specs, cache, inputs_embeds):
    """Run the prompt through the decoder, filling cache slots [0, T).

    Returns (logits (B, T, V), cache)."""
    logits, cache = phi.forward(params, config, specs, inputs_embeds, cache, 0)
    return logits, cache


@functools.partial(
    jax.jit,
    static_argnames=("config", "specs", "max_steps", "eos_id", "temperature", "top_k", "top_p"),
    donate_argnums=(3,),
)
def decode_loop(
    params,
    config,
    specs,
    cache,
    first_token,
    pos,
    *,
    max_steps: int,
    eos_id: int = -1,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    key=None,
):
    """Fused greedy/sampling decode: one jit, ``max_steps`` iterations on device.

    Args:
      first_token: (B,) int32 — the first token to feed (e.g. argmax of the
        prefill logits).
      pos: scalar int32 — number of cache slots already filled.

    Returns (tokens (B, max_steps) including ``first_token``'s successors...,
    actually: tokens[i] = token generated at step i, with tokens[0] being the
    model's response to ``first_token``; n_done (B,) — number of valid tokens
    per row (stops after ``eos_id``).
    """
    b = first_token.shape[0]
    tokens0 = jnp.zeros((b, max_steps), jnp.int32)
    done0 = jnp.zeros((b,), bool)
    k0 = key if key is not None else jax.random.PRNGKey(0)

    def cond(carry):
        i, _, _, _, _, done, _ = carry
        return jnp.logical_and(i < max_steps, jnp.logical_not(jnp.all(done)))

    def body(carry):
        i, tok, cache, pos, tokens, done, k = carry
        embeds = phi.embed_tokens(params, tok[:, None])
        logits, cache = phi.forward(params, config, specs, embeds, cache, pos)
        k, sub = jax.random.split(k)
        nxt = sample_token(
            logits[:, -1], sub, temperature=temperature, top_k=top_k, top_p=top_p
        )
        nxt = jnp.where(done, tok, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
        done = jnp.logical_or(done, nxt == eos_id)
        return (i + 1, nxt, cache, pos + 1, tokens, done, k)

    i, _, cache, _, tokens, done, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), first_token, cache, pos, tokens0, done0, k0)
    )
    return tokens, i, cache


class Decoder:
    """Convenience wrapper holding (params, config, specs) with a streaming
    generate API.  ``specs`` must be hashable (tuple of dicts is not — we
    convert to a tuple of frozen tuples internally)."""

    def __init__(self, params, config: phi.PhiConfig, specs, max_len: int = 2048,
                 cache_dtype=jnp.bfloat16, cache_layout: str = "auto"):
        """``cache_layout="auto"`` picks the T-major KV layout under the same
        policy as the Engine (max_len ≥ 2048 and head_dim < 128 — row-major
        is lane-padded to 128 in the jitted decode loop, streaming 2× the
        logical KV bytes; docs/DESIGN.md §6 round 4): prefill runs row-major
        and the cache transposes once before the decode loop."""
        from ternary_vllm_tpu.serve.engine import resolve_cache_layout

        self.params = params
        self.config = config
        self.specs = phi.freeze_specs(specs)
        self.max_len = max_len
        self.cache_dtype = cache_dtype
        self.cache_layout = resolve_cache_layout(
            cache_layout, max_len, config.head_dim, None
        )

    def new_cache(self, batch: int = 1):
        return phi.init_cache(self.config, batch, self.max_len, self.cache_dtype)

    def generate(
        self,
        prompt_embeds,
        max_new_tokens: int = 128,
        eos_id: int = -1,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        key=None,
    ) -> Tuple[jnp.ndarray, int, dict]:
        """prompt_embeds (B, T, D) → (tokens (B, n), n_valid, timing dict)."""
        b, t, _ = prompt_embeds.shape
        if t + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({t}) + max_new_tokens ({max_new_tokens}) exceeds "
                f"cache capacity max_len={self.max_len}"
            )
        tb = _bucket(t, buckets=tuple(x for x in (32, 64, 128, 256, 512, 1024, 2048) if x <= self.max_len) or (self.max_len,))
        tb = min(tb, self.max_len)
        if tb > t:
            prompt_embeds = jnp.pad(prompt_embeds, ((0, 0), (0, tb - t), (0, 0)))
        cache = self.new_cache(b)

        t0 = time.perf_counter()
        logits, cache = prefill(self.params, self.config, self.specs, cache, prompt_embeds)
        first = jnp.argmax(logits[:, t - 1], axis=-1).astype(jnp.int32)
        if self.cache_layout == "tmajor":
            cache = _transpose_cache_jit(cache)
        first.block_until_ready()
        t1 = time.perf_counter()

        # decode resumes at the TRUE prompt length t (not the padded bucket tb):
        # each new token overwrites its own cache slot before it is attended,
        # so the padded-garbage slots in [t, tb) are never observed.
        tokens, n, cache = decode_loop(
            self.params,
            self.config,
            self.specs,
            cache,
            first,
            jnp.int32(t),
            max_steps=max_new_tokens,
            eos_id=eos_id,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            key=key,
        )
        tokens.block_until_ready()
        t2 = time.perf_counter()
        n = int(n)
        out = jnp.concatenate([first[:, None], tokens[:, : max(n - 1, 0)]], axis=1)
        timing = {
            "prefill_s": t1 - t0,
            "decode_s": t2 - t1,
            "tokens": n,
            "tokens_per_s": n / (t2 - t1) if t2 > t1 else float("inf"),
        }
        return out, n, timing


def greedy_generate(params, config, specs, prompt_embeds, max_new_tokens=64, eos_id=-1, max_len=2048):
    """One-shot functional wrapper (the reference's ``inference_loop`` shape,
    ``test_tflite.py:193-219``)."""
    dec = Decoder(params, config, specs, max_len=max_len)
    return dec.generate(prompt_embeds, max_new_tokens=max_new_tokens, eos_id=eos_id)
