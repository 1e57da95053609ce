"""Fused projections (in_proj / out2 dual-accumulator kernel): exact parity
with the unfused packed model."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    fuse_packed_decoder_params,
    pack_decoder_params,
    quantize_decoder_params,
)

CFG = phi.TINY_PHI_CONFIG


def test_dual_matmul_matches_two_matmuls():
    rng = np.random.default_rng(0)
    m, k1, k2, n = 3, 64, 128, 32
    x1 = rng.normal(size=(m, k1)).astype(np.float32)
    x2 = rng.normal(size=(m, k2)).astype(np.float32)
    w1 = rng.integers(-1, 2, size=(k1, n)).astype(np.float32)
    w2 = rng.integers(-1, 2, size=(k2, n)).astype(np.float32)
    s1v = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
    s2v = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
    b1 = (rng.normal(size=(n,)) * 0.1).astype(np.float32)
    b2 = (rng.normal(size=(n,)) * 0.1).astype(np.float32)
    stacked = jnp.concatenate([pack_ternary(w1), pack_ternary(w2)], axis=0)
    out = dual_ternary_matmul(
        jnp.asarray(x1), jnp.asarray(x2), stacked, k1 // 4,
        jnp.asarray(s1v), jnp.asarray(b1), jnp.asarray(s2v), jnp.asarray(b2),
        clip_val=5.0,
    )
    ref = np.clip(x1 @ w1 * s1v + b1, -5, 5) + np.clip(x2 @ w2 * s2v + b2, -5, 5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def _packed_setup():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    return pack_decoder_params(qat, qspecs, k_multiple=4)


def test_fused_model_matches_unfused():
    packed, specs = _packed_setup()
    fused, fspecs = fuse_packed_decoder_params(packed, specs)
    assert "in_proj" in fspecs[0] and "out2" in fspecs[0]

    ids = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (2, 7)))
    ref, _ = phi.forward_tokens(packed, CFG, specs, ids)
    out, _ = phi.forward_tokens(fused, CFG, fspecs, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_cached_decode_matches():
    packed, specs = _packed_setup()
    fused, fspecs = fuse_packed_decoder_params(packed, specs)
    from ternary_vllm_tpu.serve.decode import Decoder

    emb = phi.embed_tokens(packed, jnp.asarray([[1, 2, 3]])).astype(jnp.float32)
    d1 = Decoder(packed, CFG, specs, max_len=32, cache_dtype=jnp.float32)
    d2 = Decoder(fused, CFG, fspecs, max_len=32, cache_dtype=jnp.float32)
    t1, _, _ = d1.generate(emb, max_new_tokens=6)
    t2, _, _ = d2.generate(emb, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_partial_quantization_passes_through():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig(start_skip=1))
    packed, specs = pack_decoder_params(qat, qspecs, k_multiple=4)
    fused, fspecs = fuse_packed_decoder_params(packed, specs)
    assert "wqkv" in fspecs[0]  # dense layer untouched
    assert "in_proj" in fspecs[1]
    ids = jnp.asarray([[4, 5, 6]])
    ref, _ = phi.forward_tokens(packed, CFG, specs, ids)
    out, _ = phi.forward_tokens(fused, CFG, fspecs, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
