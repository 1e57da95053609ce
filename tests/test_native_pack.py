"""Native C++ pack/unpack/calibrate library: exact agreement with the jnp
implementations (the reference's native-op correctness tests,
``zero_out_tests.py`` / ``ternary_tests.py``, for our library)."""

import numpy as np
import pytest

from ternary_vllm_tpu.ops import native_pack
from ternary_vllm_tpu.ops.packing import pack_binary_np, pack_ternary_np

pytestmark = pytest.mark.skipif(
    not native_pack.available(), reason="native library unavailable (no g++)"
)


def test_pack_ternary_matches_numpy():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(1031, 17)).astype(np.float32)  # odd K exercises padding
    np.testing.assert_array_equal(native_pack.pack_ternary_native(w), pack_ternary_np(w))


def test_ternary_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.integers(-1, 2, size=(555, 9)).astype(np.float32)
    packed = native_pack.pack_ternary_native(w)
    out = native_pack.unpack_ternary_native(packed, 555)
    np.testing.assert_array_equal(out, w)


def test_pack_binary_matches_numpy():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(77, 33)).astype(np.float32)
    np.testing.assert_array_equal(native_pack.pack_binary_native(w), pack_binary_np(w))


def test_binary_roundtrip_both_flavors():
    rng = np.random.default_rng(3)
    w = rng.choice([-1.0, 1.0], size=(100, 5)).astype(np.float32)
    packed = native_pack.pack_binary_native(w)
    np.testing.assert_array_equal(native_pack.unpack_binary_native(packed, 100), w)
    w01 = (w + 1) / 2
    np.testing.assert_array_equal(
        native_pack.unpack_binary_native(packed, 100, zero_one=True), w01
    )


def test_calibrate_matches_jax():
    import jax.numpy as jnp

    from ternary_vllm_tpu.quant.calibrate import calibrate_ternary

    rng = np.random.default_rng(4)
    w = (rng.normal(size=(256, 12)) * 0.05).astype(np.float32)
    lat_c, scale_c = native_pack.calibrate_ternary_native(w, kmeans_iter=10)
    lat_j, scale_j = calibrate_ternary(jnp.asarray(w), "independent", 10)
    np.testing.assert_allclose(scale_c, np.asarray(scale_j), rtol=1e-5)
    np.testing.assert_allclose(lat_c, np.asarray(lat_j), rtol=1e-4, atol=1e-6)


def test_native_is_fast_enough():
    # a moondream-sized layer should calibrate+pack in well under a second
    import time

    rng = np.random.default_rng(5)
    w = rng.normal(size=(2048, 8192)).astype(np.float32)
    t0 = time.perf_counter()
    latent, scale = native_pack.calibrate_ternary_native(w)
    packed = native_pack.pack_ternary_native(latent)
    dt = time.perf_counter() - t0
    assert packed.shape == (512, 8192)
    assert dt < 5.0, f"native calibrate+pack too slow: {dt:.2f}s"
