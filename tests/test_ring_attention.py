"""Ring attention: exact parity with full causal attention on the 8-way CPU
ring (context parallelism, net-new vs the reference)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.parallel.ring_attention import ring_attention


def _ref(q, k, v, causal):
    t = q.shape[2]
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(q.shape[-1])
    if causal:
        mask = np.tril(np.ones((t, t), bool))
        logits = np.where(mask[None, None], logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, tp=4, devices=jax.devices()[:4], axis_names=("data", "model"))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(mesh, causal):
    rng = np.random.default_rng(0)
    b, h, t, hd = 2, 3, 32, 16
    q = rng.normal(size=(b, h, t, hd)).astype(np.float32)
    k = rng.normal(size=(b, h, t, hd)).astype(np.float32)
    v = rng.normal(size=(b, h, t, hd)).astype(np.float32)
    out = ring_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh, causal=causal)
    ref = _ref(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_ring_rejects_unsharded_length(mesh):
    q = jnp.zeros((1, 1, 30, 8))
    with pytest.raises(ValueError):
        ring_attention(q, q, q, mesh)
