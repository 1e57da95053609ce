"""Prompt-lookup (n-gram) speculative decoding — lossless greedy speedup.

Net-new serving capability (no reference counterpart; the reference decodes
strictly one token per interpreter invoke, ``test_tflite.py:193-219``).
Instead of a draft model, proposals come from the sequence itself: if the
last ``n`` tokens already occurred earlier in (prompt + generated) history,
the ``k`` tokens that followed that occurrence are proposed, and ONE forward
pass over ``k+1`` tokens verifies them (greedy accept = proposal matches the
model's argmax).  Accepted runs emit several tokens per model step; rejected
proposals cost nothing extra because the verify step's first output is
exactly the token a plain decode step would have produced.

TPU-first shape discipline: everything lives in one ``lax.while_loop`` under
one jit — fixed-width history buffer, fixed ``k+1`` verify window, fixed
token output buffer, per-sequence positions (the same vector-``pos`` cache
writes the continuous-batching engine uses).  Stale cache slots written for
rejected proposals are overwritten before they are ever attended (the causal
mask bounds reads by each row's true position).

Output is bit-identical to :func:`ternary_vllm_tpu.serve.decode.decode_loop`
with ``temperature=0`` — asserted by ``tests/test_speculative.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models import phi


def ngram_propose(history, hist_len, *, k: int, n: int = 3):
    """Propose ``k`` continuation tokens per row by n-gram lookup.

    Args:
      history: (B, L) int32 — prompt + generated tokens, left-aligned.
      hist_len: (B,) int32 — number of valid tokens per row.
      k: number of tokens to propose.
      n: n-gram width to match (the last ``n`` tokens of each row).

    Returns (B, k) int32 proposals.  Rows with no match (or fewer than ``n``
    tokens) propose the last token repeated — wrong proposals are merely
    rejected by the verifier, so the fallback only affects speed, never
    output.
    """
    b, length = history.shape
    if length < n + 1:
        raise ValueError(f"history width {length} too small for n={n}")

    def row(hist, hlen):
        last = jnp.maximum(hlen - 1, 0)
        # the row's current n-gram suffix (garbage if hlen < n; masked below)
        suffix = jax.lax.dynamic_slice(hist, (jnp.maximum(hlen - n, 0),), (n,))
        # match positions i: hist[i : i+n] == suffix, i + n < hlen (a real
        # continuation exists), and not the suffix occurrence itself
        eq = jnp.ones((length - n + 1,), bool)
        for j in range(n):
            eq = jnp.logical_and(eq, hist[j : length - n + 1 + j] == suffix[j])
        i = jnp.arange(length - n + 1)
        valid = eq & (i + n < hlen) & (i < hlen - n) & (hlen >= n)
        masked = jnp.where(valid, i, -1)
        idx = jnp.max(masked)
        found = idx >= 0
        start = jnp.clip(jnp.where(found, idx + n, 0), 0, length - k)
        cont = jax.lax.dynamic_slice(hist, (start,), (k,))
        # beyond hlen the buffer holds zeros/garbage: replace with last token
        tail_ok = start + jnp.arange(k) < hlen
        fallback = jnp.full((k,), hist[last])
        return jnp.where(found & tail_ok, cont, fallback)

    return jax.vmap(row)(history, hist_len)


@functools.partial(
    jax.jit,
    static_argnames=("config", "specs", "max_steps", "eos_id", "k", "n"),
    donate_argnums=(3,),
)
def speculative_decode_loop(
    params,
    config,
    specs,
    cache,
    first_token,
    pos,
    history,
    hist_len,
    *,
    max_steps: int,
    eos_id: int = -1,
    k: int = 4,
    n: int = 3,
):
    """Greedy decode with n-gram speculation: one jit, multi-token steps.

    Args:
      first_token: (B,) int32 — first token to feed (argmax of prefill).
      pos: scalar or (B,) int32 — cache slots already filled per row.
      history: (B, L) int32 — prompt token ids (+ ``first_token``) left-
        aligned; L must cover prompt + max_steps + k + 1.  Positions without
        a meaningful id (e.g. spliced image embeddings) may hold -1.
      hist_len: (B,) int32 — valid length of ``history`` per row.

    Returns ``(tokens (B, max_steps + k + 1), n_done (B,), cache)`` with the
    same semantics as ``decode_loop``: ``tokens[:, i]`` is the i-th generated
    token (the successor of ``first_token`` first), ``n_done`` counts valid
    tokens per row (clipped to ``max_steps``), stopping after ``eos_id``.
    """
    b = first_token.shape[0]
    width = max_steps + k + 1
    cache_cap = cache[0][0].shape[2]
    if history.shape[1] < n + k + 1:
        raise ValueError("history buffer too narrow for the n-gram window")
    pos0 = (jnp.full((b,), pos, jnp.int32) if jnp.ndim(pos) == 0 else pos.astype(jnp.int32))
    tokens0 = jnp.zeros((b, width), jnp.int32)
    nem0 = jnp.zeros((b,), jnp.int32)
    done0 = jnp.zeros((b,), bool)
    col = jnp.arange(width)[None, :]
    hcol = jnp.arange(history.shape[1])[None, :]

    def cond(carry):
        _, _, _, _, _, done, _, _ = carry
        return jnp.logical_not(jnp.all(done))

    def body(carry):
        cur, cache, posv, tokens, nem, done, hist, hlen = carry
        props = ngram_propose(hist, hlen, k=k, n=n)  # (B, k)
        seq = jnp.concatenate([cur[:, None], props], axis=1)  # (B, k+1)
        embeds = phi.embed_tokens(params, seq)
        logits, cache = phi.forward(params, config, specs, embeds, cache, posv)
        out = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)
        # accepted = longest prefix of proposals matching the model's greedy
        # choices; the (acc+1)-th output is the free "bonus" token
        match = props == out[:, :k]
        acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # (B,)

        new_done = done
        for j in range(k + 1):
            tok_j = out[:, j]
            can = jnp.logical_and(jnp.logical_not(new_done), j <= acc)
            at = nem + j
            write = can[:, None] & (col == at[:, None])
            tokens = jnp.where(write, tok_j[:, None], tokens)
            hwrite = can[:, None] & (hcol == (hlen + j)[:, None])
            hist = jnp.where(hwrite, tok_j[:, None], hist)
            new_done = jnp.logical_or(new_done, can & (tok_j == eos_id))
            new_done = jnp.logical_or(new_done, can & (at + 1 >= max_steps))

        adv = jnp.where(done, 0, acc + 1)
        # count only tokens actually written before done froze the row
        emitted = jnp.zeros((b,), jnp.int32)
        d = done
        for j in range(k + 1):
            can = jnp.logical_and(jnp.logical_not(d), j <= acc)
            emitted = emitted + can.astype(jnp.int32)
            d = jnp.logical_or(d, can & (out[:, j] == eos_id))
            d = jnp.logical_or(d, can & (nem + j + 1 >= max_steps))
        nem = nem + emitted
        hlen = hlen + emitted
        cur = jnp.where(done, cur, jnp.take_along_axis(out, acc[:, None], axis=1)[:, 0])
        posv = posv + adv
        # capacity guard: next verify window must fit the cache
        new_done = jnp.logical_or(new_done, posv + k + 1 > cache_cap)
        return (cur, cache, posv, tokens, nem, new_done, hist, hlen)

    _, cache, _, tokens, nem, _, _, _ = jax.lax.while_loop(
        cond, body, (first_token, cache, pos0, tokens0, nem0, done0, history, hist_len)
    )
    return tokens, jnp.minimum(nem, max_steps), cache


def speculative_generate(
    decoder,
    prompt_embeds,
    prompt_ids,
    max_new_tokens: int = 128,
    eos_id: int = -1,
    k: int = 4,
    n: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Prefill + speculative decode using a :class:`~.decode.Decoder`'s model.

    ``prompt_ids``: (B, T) int32 token ids aligned with ``prompt_embeds``
    (use -1 at positions that are not real tokens, e.g. image embeddings).
    Returns ``(tokens (B, <=max_new_tokens incl. first), n_done (B,), timing)``.
    """
    import time

    from ternary_vllm_tpu.serve.decode import _bucket, prefill

    b, t, _ = prompt_embeds.shape
    if t + max_new_tokens + k + 1 > decoder.max_len:
        raise ValueError("prompt + max_new_tokens + k exceeds cache capacity")
    tb = min(_bucket(t), decoder.max_len)
    if tb > t:
        prompt_embeds = jnp.pad(prompt_embeds, ((0, 0), (0, tb - t), (0, 0)))
    cache = decoder.new_cache(b)

    t0 = time.perf_counter()
    logits, cache = prefill(decoder.params, decoder.config, decoder.specs, cache, prompt_embeds)
    first = jnp.argmax(logits[:, t - 1], axis=-1).astype(jnp.int32)
    first.block_until_ready()
    t1 = time.perf_counter()

    hist_width = t + 1 + max_new_tokens + k + 1
    history = jnp.zeros((b, hist_width), jnp.int32)
    history = history.at[:, :t].set(prompt_ids[:, :t])
    history = history.at[:, t].set(first)
    hist_len = jnp.full((b,), t + 1, jnp.int32)

    tokens, nd, cache = speculative_decode_loop(
        decoder.params, decoder.config, decoder.specs, cache, first,
        jnp.int32(t), history, hist_len,
        max_steps=max_new_tokens, eos_id=eos_id, k=k, n=n,
    )
    tokens.block_until_ready()
    t2 = time.perf_counter()
    total = int(jnp.sum(nd))
    timing = {
        "prefill_s": t1 - t0,
        "decode_s": t2 - t1,
        "tokens": total,
        "tokens_per_s": total / (t2 - t1) if t2 > t1 else float("inf"),
    }
    return tokens, nd, timing
