"""Pack/unpack roundtrip invariants — the reference's core unit-test idea
(reference ``impl/tf/moondream/ternary_tests.py:17-26``: roundtrip identity on
an odd-sized random ternary tensor to exercise padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.ops.packing import (
    pack_binary,
    pack_binary_np,
    pack_ternary,
    pack_ternary_np,
    packed_binary_shape,
    packed_ternary_shape,
    unpack_binary,
    unpack_ternary,
)


@pytest.mark.parametrize("shape", [(16, 8), (5031, 3), (7, 128), (2048, 256)])
def test_ternary_roundtrip(shape):
    rng = np.random.default_rng(0)
    w = rng.integers(-1, 2, size=shape).astype(np.float32)
    packed = pack_ternary(w)
    assert packed.dtype == jnp.uint8
    assert packed.shape == packed_ternary_shape(*shape)
    out = unpack_ternary(packed, shape[0])
    np.testing.assert_array_equal(np.asarray(out), w)


@pytest.mark.parametrize("shape", [(16, 8), (5031, 3), (13, 64)])
def test_binary_roundtrip(shape):
    rng = np.random.default_rng(1)
    w = rng.choice([-1.0, 1.0], size=shape).astype(np.float32)
    packed = pack_binary(w)
    assert packed.shape == packed_binary_shape(*shape)
    out = unpack_binary(packed, shape[0])
    np.testing.assert_array_equal(np.asarray(out), w)


def test_binary01_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.choice([0.0, 1.0], size=(33, 16)).astype(np.float32)
    # packing maps >=0 to bit 1; for a {0,1} tensor, shift to {-1,+1} convention
    packed = pack_binary(w * 2 - 1, zero_one=True)
    out = unpack_binary(packed, 33, zero_one=True)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_pack_hard_quantizes_latent_floats():
    # packing latent FP weights == tri-step quantize (thresholds ±0.5) then pack
    w = np.array([[0.49, 0.5, -0.49, -0.51], [1.7, -2.0, 0.0, 0.2]], np.float32).T
    out = unpack_ternary(pack_ternary(w), 4)
    expected = (w >= 0.5).astype(np.float32) - (w <= -0.5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_np_variants_match_jnp():
    rng = np.random.default_rng(3)
    w = rng.integers(-1, 2, size=(100, 7)).astype(np.float32)
    np.testing.assert_array_equal(pack_ternary_np(w), np.asarray(pack_ternary(w)))
    wb = rng.choice([-1.0, 1.0], size=(100, 7)).astype(np.float32)
    np.testing.assert_array_equal(pack_binary_np(wb), np.asarray(pack_binary(wb)))


def test_pack_is_jittable():
    w = jnp.asarray(np.random.default_rng(4).integers(-1, 2, size=(64, 32)), jnp.float32)
    packed = jax.jit(pack_ternary)(w)
    out = jax.jit(lambda p: unpack_ternary(p, 64))(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))
