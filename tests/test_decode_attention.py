"""Fused decode-attention kernel: parity vs masked-softmax reference
(interpret mode on CPU), scalar + per-row positions, GQA."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.ops.decode_attention import (
    _decode_attention_xla,
    decode_attention,
)


def _ref(q, k, v, pos):
    b, h, hd = q.shape
    _, kvh, t, _ = k.shape
    groups = h // kvh
    k = np.repeat(k, groups, axis=1) if groups > 1 else k
    v = np.repeat(v, groups, axis=1) if groups > 1 else v
    pos = np.broadcast_to(np.asarray(pos).reshape(-1), (b,))
    out = np.zeros_like(q)
    for bi in range(b):
        n = pos[bi] + 1
        logits = np.einsum("hd,htd->ht", q[bi], k[bi, :, :n]) / math.sqrt(hd)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out[bi] = np.einsum("ht,htd->hd", p, v[bi, :, :n])
    return out


def _case(b=2, h=4, kvh=4, t=512, hd=64, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, h, hd)).astype(np.float32)
    k = rng.normal(size=(b, kvh, t, hd)).astype(np.float32)
    v = rng.normal(size=(b, kvh, t, hd)).astype(np.float32)
    return q, k, v


@pytest.mark.parametrize("pos", [0, 5, 255, 256, 400, 511])
def test_pallas_matches_reference_scalar_pos(pos):
    q, k, v = _case()
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(pos), impl="pallas"
    )
    ref = _ref(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pallas_per_row_positions():
    q, k, v = _case(b=3)
    pos = jnp.asarray([3, 300, 511], jnp.int32)
    out = decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, impl="pallas")
    ref = _ref(q, k, v, np.asarray(pos))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_gqa_grouping():
    q, k, v = _case(b=1, h=8, kvh=2)
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(100), impl="pallas"
    )
    ref = _ref(q, k, v, 100)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_xla_fallback_matches():
    q, k, v = _case(t=48)  # not chunk-divisible -> fallback
    out = decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(20))
    ref = _ref(q, k, v, 20)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_model_decode_unchanged_by_fused_attention():
    """End-to-end: cached decode (which now routes t==1 through the fused
    path's XLA fallback on CPU) still matches the full forward."""
    from ternary_vllm_tpu.models import phi

    CFG = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (2, 9)))
    full_logits, _ = phi.forward_tokens(params, CFG, specs, ids)
    cache = phi.init_cache(CFG, 2, 16, jnp.float32)
    emb = phi.embed_tokens(params, ids)
    la, cache = phi.forward(params, CFG, specs, emb[:, :5], cache, 0)
    outs = [la]
    for t in range(5, 9):
        lg, cache = phi.forward(params, CFG, specs, emb[:, t : t + 1], cache, t)
        outs.append(lg)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full_logits), rtol=2e-4, atol=2e-4
    )
