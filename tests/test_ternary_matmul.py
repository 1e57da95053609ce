"""Packed matmul correctness: Pallas kernel (interpret mode on CPU) and XLA
fallback vs a dense reference, including the fused scale/bias/clip/act
epilogue (the reference's fused-native-op contract,
``impl/tf/moondream/ternary.py:278-303``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.ops.packing import pack_binary, pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import binary_matmul, ternary_matmul


def _make_case(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.integers(-1, 2, size=(k, n)).astype(np.float32)
    scale = (rng.uniform(0.5, 2.0, size=(n,))).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32) * 0.1
    return x, w, scale, bias


def _ref(x, w, scale, bias, clip_val=100.0, act=None):
    y = x @ w * scale + bias
    y = np.clip(y, -clip_val, clip_val)
    if act == "gelu_new":
        y = np.asarray(jax.nn.gelu(jnp.asarray(y), approximate=True))
    return y


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_ternary_matmul_matches_dense(impl):
    m, k, n = 16, 512, 128
    x, w, scale, bias = _make_case(m, k, n)
    packed = pack_ternary(w)
    out = ternary_matmul(
        jnp.asarray(x), packed, jnp.asarray(scale), jnp.asarray(bias), impl=impl
    )
    np.testing.assert_allclose(np.asarray(out), _ref(x, w, scale, bias), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_ternary_matmul_fused_gelu(impl):
    m, k, n = 8, 512, 128
    x, w, scale, bias = _make_case(m, k, n, seed=1)
    packed = pack_ternary(w)
    out = ternary_matmul(
        jnp.asarray(x), packed, jnp.asarray(scale), jnp.asarray(bias),
        act="gelu_new", impl=impl,
    )
    ref = _ref(x, w, scale, bias, act="gelu_new")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_clip_applies():
    m, k, n = 4, 512, 128
    x, w, _, _ = _make_case(m, k, n, seed=2)
    x = x * 10
    packed = pack_ternary(w)
    out = ternary_matmul(jnp.asarray(x), packed, clip_val=5.0, impl="xla")
    assert float(jnp.max(jnp.abs(out))) <= 5.0


def test_unaligned_k_zero_padded():
    # K not a multiple of 4: packing pads with value-0 codes (exactly neutral)
    m, k, n = 3, 37, 16
    x, w, scale, bias = _make_case(m, k, n, seed=3)
    packed = pack_ternary(w)
    out = ternary_matmul(jnp.asarray(x), packed, jnp.asarray(scale), jnp.asarray(bias), impl="xla")
    np.testing.assert_allclose(np.asarray(out), _ref(x, w, scale, bias), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("zero_one", [False, True])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_binary_matmul(zero_one, impl):
    m, k, n = 8, 1024, 128
    rng = np.random.default_rng(5)
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.choice([-1.0, 1.0], size=(k, n)).astype(np.float32)
    w_eff = (w + 1) / 2 if zero_one else w
    scale = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
    bias = np.zeros(n, np.float32)
    packed = pack_binary(w, zero_one=zero_one)
    out = binary_matmul(
        jnp.asarray(x), packed, jnp.asarray(scale), jnp.asarray(bias),
        zero_one=zero_one, impl=impl,
    )
    np.testing.assert_allclose(np.asarray(out), _ref(x, w_eff, scale, bias), rtol=2e-4, atol=2e-4)


def test_batched_leading_dims():
    x, w, scale, bias = _make_case(6, 512, 128, seed=6)
    x3 = x.reshape(2, 3, 512)
    packed = pack_ternary(w)
    out = ternary_matmul(jnp.asarray(x3), packed, jnp.asarray(scale), jnp.asarray(bias), impl="xla")
    assert out.shape == (2, 3, 128)
    np.testing.assert_allclose(
        np.asarray(out).reshape(6, 128), _ref(x, w, scale, bias), rtol=2e-4, atol=2e-4
    )


def test_bfloat16_activations():
    m, k, n = 16, 512, 128
    x, w, scale, bias = _make_case(m, k, n, seed=7)
    packed = pack_ternary(w)
    out = ternary_matmul(
        jnp.asarray(x, jnp.bfloat16), packed, jnp.asarray(scale), jnp.asarray(bias), impl="pallas"
    )
    assert out.dtype == jnp.bfloat16
    ref = _ref(x, w, scale, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=0.05, atol=0.3)
