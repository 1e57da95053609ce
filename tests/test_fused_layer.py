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


def test_dual_matmul_binary_modes_a8():
    """Binary dual (w1a8): parity with two separate w1a8 matmuls."""
    from ternary_vllm_tpu.ops.packing import pack_binary
    from ternary_vllm_tpu.ops.ternary_matmul import quantized_matmul

    rng = np.random.default_rng(0)
    m, k1, k2, n = 3, 128, 256, 128
    for mode in ("binary", "binary01"):
        lo = 0 if mode == "binary01" else -1
        x1 = jnp.asarray(rng.normal(size=(m, k1)).astype(np.float32))
        x2 = jnp.asarray(rng.normal(size=(m, k2)).astype(np.float32))
        w1 = rng.integers(lo, 2, size=(k1, n)).astype(np.float32)
        w2 = rng.integers(lo, 2, size=(k2, n)).astype(np.float32)
        if mode == "binary":
            w1[w1 == 0] = -1.0
            w2[w2 == 0] = -1.0
        zo = mode == "binary01"
        s1v = jnp.asarray(rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32))
        s2v = jnp.asarray(rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32))
        b1 = jnp.asarray((rng.normal(size=(n,)) * 0.1).astype(np.float32))
        b2 = jnp.asarray((rng.normal(size=(n,)) * 0.1).astype(np.float32))
        stacked = jnp.concatenate(
            [pack_binary(jnp.asarray(w1), zero_one=zo),
             pack_binary(jnp.asarray(w2), zero_one=zo)], axis=0
        )
        out = dual_ternary_matmul(
            x1, x2, stacked, k1 // 8, s1v, b1, s2v, b2,
            clip_val=100.0, a8=True, mode=mode,
        )
        r1 = quantized_matmul(x1, pack_binary(jnp.asarray(w1), zero_one=zo),
                              mode=mode, scale=s1v, bias=b1, clip_val=100.0, a8=True)
        r2 = quantized_matmul(x2, pack_binary(jnp.asarray(w2), zero_one=zo),
                              mode=mode, scale=s2v, bias=b2, clip_val=100.0, a8=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(r1 + r2), rtol=1e-4, atol=1e-4,
            err_msg=mode,
        )


def test_fused_binary_model_matches_unfused():
    """w1a8 fused decoder (in_proj + binary dual out2) == unfused w1a8."""
    for mode in ("binary", "binary01"):
        params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
        qat, qspecs = quantize_decoder_params(
            params, CFG, QuantConfig(quantization=mode)
        )
        packed, specs = pack_decoder_params(qat, qspecs, k_multiple=8, a8=True)
        fused, fspecs = fuse_packed_decoder_params(packed, specs)
        assert "in_proj" in fspecs[0], mode
        assert fspecs[0]["in_proj"].mode == mode

        ids = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (2, 7)))
        ref, _ = phi.forward_tokens(packed, CFG, specs, ids)
        out, _ = phi.forward_tokens(fused, CFG, fspecs, ids)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4, err_msg=mode
        )


def test_fused_binary_cached_decode_matches():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(
        params, CFG, QuantConfig(quantization="binary")
    )
    packed, specs = pack_decoder_params(qat, qspecs, k_multiple=8, a8=True)
    fused, fspecs = fuse_packed_decoder_params(packed, specs)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, CFG.vocab_size, (1, 5)))
    emb = phi.embed_tokens(packed, ids)

    cache_r = phi.init_cache(CFG, 1, 32, jnp.float32)
    ref, cache_r = phi.forward(packed, CFG, phi.freeze_specs(specs), emb, cache_r, 0)
    cache_f = phi.init_cache(CFG, 1, 32, jnp.float32)
    out, cache_f = phi.forward(fused, CFG, phi.freeze_specs(fspecs), emb, cache_f, 0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-4, atol=2e-4
    )
    # one decode step from the filled cache
    nxt = jnp.argmax(out[:, -1], axis=-1)[:, None]
    e2 = phi.embed_tokens(packed, nxt)
    r2, _ = phi.forward(packed, CFG, phi.freeze_specs(specs), e2, cache_r, jnp.int32(5))
    o2, _ = phi.forward(fused, CFG, phi.freeze_specs(fspecs), e2, cache_f, jnp.int32(5))
    np.testing.assert_allclose(
        np.asarray(o2, np.float32), np.asarray(r2, np.float32), rtol=2e-4, atol=2e-4
    )
