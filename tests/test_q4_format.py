"""q4 (nibble int4) packed format: roundtrip, matmul parity, model pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.ops.packing import pack_q4, packed_q4_shape, unpack_q4
from ternary_vllm_tpu.ops.ternary_matmul import ternary_matmul


@pytest.mark.parametrize("shape", [(16, 8), (33, 5), (128, 64)])
def test_q4_roundtrip_ternary(shape):
    rng = np.random.default_rng(0)
    w = rng.integers(-1, 2, size=shape).astype(np.float32)
    packed = pack_q4(w)
    assert packed.shape == packed_q4_shape(*shape)
    np.testing.assert_array_equal(np.asarray(unpack_q4(packed, shape[0])), w)


def test_q4_roundtrip_full_int4_range():
    rng = np.random.default_rng(1)
    w = rng.integers(-8, 8, size=(40, 12)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(unpack_q4(pack_q4(w), 40)), w)


def test_q4_matmul_matches_dense_xla():
    rng = np.random.default_rng(2)
    m, k, n = 4, 128, 64
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.integers(-1, 2, size=(k, n)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
    out = ternary_matmul(jnp.asarray(x), pack_q4(w), jnp.asarray(scale), fmt="q4")
    ref = np.clip(x @ w * scale, -100, 100)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_q4_rejects_binary():
    from ternary_vllm_tpu.ops.ternary_matmul import quantized_matmul

    with pytest.raises(ValueError):
        quantized_matmul(jnp.ones((1, 16)), jnp.zeros((2, 16), jnp.uint8),
                         mode="binary", fmt="q4")


def test_pack_decoder_params_q4():
    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.quant.quantize import (
        QuantConfig, pack_decoder_params, quantize_decoder_params, size_report,
    )

    CFG = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    p2, s2 = pack_decoder_params(qat, qspecs, k_multiple=4, fmt="q2")
    p4, s4 = pack_decoder_params(qat, qspecs, k_multiple=4, fmt="q4")
    assert s4[0]["fc1"].fmt == "q4"
    # q4 stores the same values at twice the bytes
    assert p4["layers"][0]["fc1"]["packed"].shape[0] == 2 * p2["layers"][0]["fc1"]["packed"].shape[0]

    ids = jnp.asarray([[1, 2, 3, 4]])
    l2, _ = phi.forward_tokens(p2, CFG, s2, ids)
    l4, _ = phi.forward_tokens(p4, CFG, s4, ids)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l4), rtol=1e-4, atol=1e-4)

    r2, r4 = size_report(p2, s2), size_report(p4, s4)
    assert r4["quantized_params"] == r2["quantized_params"]
    assert r4["quantized_bits"] == 2 * r2["quantized_bits"]
