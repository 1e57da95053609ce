"""Calibration semantics parity vs the reference's torch implementation
(reference ``binary/modules.py:189-299``), cross-checked against a direct
numpy transcription of the algorithm."""

import numpy as np
import jax.numpy as jnp

from ternary_vllm_tpu.quant.calibrate import (
    calibrate_binary,
    calibrate_linear,
    calibrate_ternary,
)


def _ref_ternary_np(w_out_in, neuron_scale="independent", kmeans_iter=10):
    """Direct numpy transcription of modules.py:275-298 (torch (out,in) layout)."""
    abs_w = np.abs(w_out_in)
    if neuron_scale == "uniform":
        abs_w = abs_w.reshape(1, -1)
    m = abs_w.mean(axis=1)
    for _ in range(kmeans_iter):
        d = abs_w - m[:, None]
        mask = d > -m[:, None] / 2.0
        m = (abs_w * mask).sum(axis=1) / mask.sum(axis=1)
    scale = 1.0 / m
    latent = np.clip(w_out_in * scale[:, None] if m.shape[0] > 1 else w_out_in * scale, -1, 1)
    return latent, m


def test_ternary_independent_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(32, 48)) * 0.05).astype(np.float32)  # (out, in) torch layout
    ref_latent, ref_scale = _ref_ternary_np(w, "independent")
    latent, scale = calibrate_ternary(jnp.asarray(w.T), "independent")  # ours: (K, N)
    np.testing.assert_allclose(np.asarray(scale), ref_scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(latent), ref_latent.T, rtol=1e-4, atol=1e-6)


def test_ternary_uniform_matches_reference_algorithm():
    rng = np.random.default_rng(1)
    w = (rng.normal(size=(16, 24)) * 0.1).astype(np.float32)
    ref_latent, ref_scale = _ref_ternary_np(w, "uniform")
    latent, scale = calibrate_ternary(jnp.asarray(w.T), "uniform")
    assert np.allclose(np.asarray(scale), ref_scale[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(latent), ref_latent.T, rtol=1e-4, atol=1e-6)


def test_binary_uniform_scale_is_absmean():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 32)).astype(np.float32)  # (K, N)
    latent, scale = calibrate_binary(jnp.asarray(w))
    # (m_pos - m_neg)/numel == mean(|w|)  (modules.py:197-205)
    np.testing.assert_allclose(np.asarray(scale), np.full(32, np.abs(w).mean()), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(latent), np.clip(w, -1, 1))


def test_binary_independent_scale_per_channel():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(64, 8)).astype(np.float32)
    _, scale = calibrate_binary(jnp.asarray(w), neuron_scale="independent")
    np.testing.assert_allclose(np.asarray(scale), np.abs(w).mean(axis=0), rtol=1e-5)


def test_binary01_scale_positive_mean():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(50, 6)).astype(np.float32)
    _, scale = calibrate_binary(jnp.asarray(w), zero_one=True, neuron_scale="independent")
    expected = np.where(w > 0, w, 0).sum(axis=0) / 50
    np.testing.assert_allclose(np.asarray(scale), expected, rtol=1e-5)


def test_smoothing_std_and_natural():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(40, 4)).astype(np.float32)
    latent_std, _ = calibrate_binary(jnp.asarray(w), scaling="std")
    np.testing.assert_allclose(
        np.asarray(latent_std), np.clip(w / w.std(), -1, 1), rtol=1e-4
    )
    latent_nat, scale = calibrate_binary(jnp.asarray(w), scaling="natural", neuron_scale="independent")
    np.testing.assert_allclose(
        np.asarray(latent_nat), np.clip(w / np.asarray(scale)[None, :], -1, 1), rtol=1e-4
    )
    latent_f, _ = calibrate_binary(jnp.asarray(w), scaling=2.0)
    np.testing.assert_allclose(np.asarray(latent_f), np.clip(w * 2.0, -1, 1), rtol=1e-5)


def test_calibrate_linear_dispatch():
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    for mode in ("ternary", "binary", "binary01", "smoothBinary"):
        latent, scale = calibrate_linear(w, mode=mode)
        assert latent.shape == (32, 16)
        assert scale.shape == (16,)


def test_ternary_quantized_reconstruction_beats_naive():
    # sanity: calibrated ternary approx should have much lower MSE than scale=1
    rng = np.random.default_rng(7)
    w = (rng.normal(size=(256, 64)) * 0.02).astype(np.float32)
    latent, scale = calibrate_ternary(jnp.asarray(w))
    q = np.asarray((latent >= 0.5).astype(jnp.float32) - (latent <= -0.5).astype(jnp.float32))
    recon = q * np.asarray(scale)[None, :]
    naive = np.sign(w)
    assert ((recon - w) ** 2).mean() < ((naive - w) ** 2).mean() * 0.1
