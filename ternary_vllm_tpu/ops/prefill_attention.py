"""Prefill attention dispatch: JAX's official Pallas flash-attention kernel on
TPU, masked-softmax XLA fallback elsewhere.

The XLA path materializes the (B, H, T, S) f32 score tensor — fine for short
prompts, wasteful at 729-token image prefills; the flash kernel keeps scores
in VMEM tiles (standard blockwise online-softmax).  We use the stock
``jax.experimental.pallas.ops.tpu.flash_attention`` rather than rolling our
own: prefill is a vanilla causal attention, exactly what the official kernel
is for (our custom kernels cover what it doesn't: length-bounded single-token
decode and int8-cache decode)."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _xla_causal(q, k, v, scale):
    t, s = q.shape[2], k.shape[2]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32) * scale
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    logits = logits + jnp.where(kv_idx <= q_idx, 0.0, neg)[None, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def prefill_attention(q, k, v, impl: str = "auto"):
    """Causal self-attention for the prefill phase.  q/k/v: (B, H, T, hd),
    same T (fresh sequence, no history).  Returns (B, H, T, hd)."""
    b, h, t, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    on_tpu = jax.default_backend() == "tpu"
    use_flash = impl in ("auto", "flash") and on_tpu and t >= 128
    if not use_flash:
        return _xla_causal(q, k, v, scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    # flash needs T % 128 == 0: pad with trailing zero tokens — causal
    # masking means no REAL query ever attends a pad key (pad positions come
    # after every real one), and pad-query rows are sliced off below.  The
    # XLA fallback materializes the full (T, T) logits (e.g. ~278 MB of f32
    # at T=1472), which used to silently swallow the whole prefill budget at
    # non-multiple lengths like 729 image tokens + text.
    tp = -(-t // 128) * 128
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # the kernel needs tp % block == 0: 256 only when it divides the padded
    # length (e.g. the VLM's 1+729+T splice pads to 128-odd multiples like
    # 896, which 256 does not divide — found by the round-5 VLM train bench)
    blk = 256 if tp % 256 == 0 else 128
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(
        q, k, v,
        causal=True, sm_scale=scale, block_sizes=sizes,
    ).astype(q.dtype)
    return out[:, :, :t] if tp != t else out
