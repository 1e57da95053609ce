"""Packed-param relayout passes: fused->unfused (sp_prefill boundary) and
packed->dense (prefill unpack-once path, round-3 VERDICT items 2 and 4).

Both passes must be numerically exact (unfuse: pure plane slicing) or
bf16-rounding-exact (unpack: dequantize once) against the packed forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.parallel.sp_prefill import sp_prefill
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    fuse_packed_decoder_params,
    pack_decoder_params,
    quantize_decoder_params,
    quantize_lm_head_int8,
    unfuse_packed_decoder_params,
    unpack_decoder_params,
)

CFG = phi.TINY_PHI_CONFIG


@pytest.fixture(scope="module", params=["ternary", "binary"])
def packed(request):
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(
        params, CFG, QuantConfig(quantization=request.param)
    )
    a8 = request.param != "ternary"  # binary fuses on the a8 kernels only
    p, s = pack_decoder_params(qat, qspecs, k_multiple=4, a8=a8)
    return quantize_lm_head_int8(p), s


def _forward_logits(params, specs, x, cache_len=32):
    cache = phi.init_cache(CFG, 1, cache_len, jnp.bfloat16)
    logits, _ = phi.forward(
        params, CFG, phi.freeze_specs(specs), x, cache, jnp.int32(0)
    )
    return np.asarray(logits, np.float32)


def test_unfuse_roundtrip_exact(packed):
    """fuse -> unfuse is the identity on packed planes/scales/biases."""
    params, specs = packed
    fused, fspecs = fuse_packed_decoder_params(params, specs)
    assert "in_proj" in fspecs[0], "fixture should produce fusable layers"
    back, bspecs = unfuse_packed_decoder_params(fused, fspecs, CFG)
    for orig, rt in zip(params["layers"], back["layers"]):
        for name in phi.QUANT_LINEARS:
            for field in orig[name]:
                np.testing.assert_array_equal(
                    np.asarray(orig[name][field]), np.asarray(rt[name][field]),
                    err_msg=f"{name}.{field}",
                )
    assert bspecs[0]["wqkv"].mode == specs[0]["wqkv"].mode
    assert bspecs[0]["wqkv"].a8 == specs[0]["wqkv"].a8


def test_sp_prefill_accepts_fused_specs(packed):
    """Ring prefill on the fused flagship layout equals unfused ring prefill
    (the NotImplementedError at sp_prefill.py:101 is gone — VERDICT item 4)."""
    params, specs = packed
    fused, fspecs = fuse_packed_decoder_params(params, specs)
    mesh = make_mesh(dp=1, tp=4, devices=jax.devices()[:4], axis_names=("data", "model"))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (1, 16)))
    emb = phi.embed_tokens(params, ids)

    logits_u, ks_u, vs_u = sp_prefill(params, CFG, specs, emb, mesh)
    logits_f, ks_f, vs_f = sp_prefill(fused, CFG, fspecs, emb, mesh)
    np.testing.assert_array_equal(np.asarray(logits_u), np.asarray(logits_f))
    np.testing.assert_array_equal(np.asarray(ks_u), np.asarray(ks_f))
    np.testing.assert_array_equal(np.asarray(vs_u), np.asarray(vs_f))


@pytest.mark.parametrize("fuse_first", [False, True])
def test_unpack_matches_packed_forward(packed, fuse_first):
    """Dequantized-dense forward matches the packed forward to bf16 rounding
    (dense specs carry the packed clip_val; scale folded into w)."""
    params, specs = packed
    if fuse_first:
        params, specs = fuse_packed_decoder_params(params, specs)
    dense, dspecs = unpack_decoder_params(params, specs, CFG)
    for spec in dspecs:
        assert all(s.kind == "dense" for s in spec.values())
        assert all(s.clip_val is not None for s in spec.values())
    x = (jax.random.normal(jax.random.PRNGKey(1), (1, 16, CFG.hidden_size)) * 0.5).astype(jnp.bfloat16)
    ref = _forward_logits(*packed, x)
    got = _forward_logits(dense, dspecs, x)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=0.02 * scale, rtol=0.05)


def test_dense_spec_clip_applied():
    """apply_linear's dense branch honors clip_val (unpack parity depends on
    it); the plain DENSE spec stays unclipped."""
    w = jnp.eye(4, dtype=jnp.bfloat16) * 100.0
    p = {"w": w, "b": jnp.zeros((4,), jnp.bfloat16)}
    x = jnp.ones((1, 4), jnp.bfloat16)
    clipped = phi.apply_linear(phi.LinearSpec(kind="dense", clip_val=10.0), p, x)
    assert float(jnp.max(clipped)) == 10.0
    unclipped = phi.apply_linear(phi.DENSE, p, x)
    assert float(jnp.max(unclipped)) == 100.0
