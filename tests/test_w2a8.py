"""w2a8 (int8-activation packed matmul) + w8a8 (int8 lm_head) paths.

The Pallas kernels use `pltpu.bitcast` + int8 MXU dots, which don't exist in
interpret mode — CPU tests exercise the bit-exact XLA fallback (same integer
arithmetic); TPU-marked tests assert kernel == fallback exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.ops.packing import pack_binary, pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import (
    int8_matmul,
    quantize_activations,
    quantized_matmul,
)
from ternary_vllm_tpu.quant.quantize import (
    quantize_linear_int8,
    quantize_lm_head_int8,
)

ON_TPU = jax.default_backend() == "tpu"


def _ref_w2a8(x, w, scale, clip=100.0):
    """Reference math: per-row int8 quantization then exact integer matmul."""
    xf = np.asarray(x, np.float32)
    amax = np.maximum(np.abs(xf).max(axis=-1, keepdims=True), 1e-6)
    xs = amax / 127.0
    xq = np.clip(np.round(xf / xs), -127, 127).astype(np.int32)
    acc = xq @ np.asarray(w, np.int32)
    out = acc.astype(np.float32) * xs * np.asarray(scale, np.float32)[None, :]
    return np.clip(out, -clip, clip)


@pytest.mark.parametrize("mode", ["ternary", "binary", "binary01"])
def test_w2a8_fallback_matches_reference_math(mode):
    rng = np.random.default_rng(0)
    K, N = 256, 128
    if mode == "ternary":
        w = rng.integers(-1, 2, (K, N)).astype(np.float32)
        packed = pack_ternary(jnp.asarray(w))
    else:
        latent = np.where(rng.random((K, N)) < 0.5, -1.0, 1.0).astype(np.float32)
        packed = pack_binary(jnp.asarray(latent), zero_one=(mode == "binary01"))
        w = (latent >= 0).astype(np.float32) if mode == "binary01" else latent
    scale = rng.uniform(0.5, 1.5, (N,)).astype(np.float32)
    x = rng.normal(0, 1, (3, K)).astype(np.float32)

    got = quantized_matmul(
        jnp.asarray(x), packed, mode=mode, scale=jnp.asarray(scale),
        clip_val=100.0, a8=True, impl="xla",
    )
    want = _ref_w2a8(x, w, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=1e-5, atol=1e-5)


def test_w2a8_close_to_bf16_path():
    """a8 quantization noise stays ~2^-8 relative on realistic magnitudes."""
    rng = np.random.default_rng(1)
    K, N = 512, 256
    w = rng.integers(-1, 2, (K, N)).astype(np.float32)
    packed = pack_ternary(jnp.asarray(w))
    scale = rng.uniform(0.5, 1.5, (N,)).astype(np.float32)
    x = rng.normal(0, 1, (2, K)).astype(np.float32)
    a8 = quantized_matmul(jnp.asarray(x), packed, mode="ternary",
                          scale=jnp.asarray(scale), a8=True, impl="xla")
    fp = quantized_matmul(jnp.asarray(x), packed, mode="ternary",
                          scale=jnp.asarray(scale), impl="xla")
    rms = float(np.sqrt(np.mean(np.square(np.asarray(fp, np.float32)))))
    rel = np.max(np.abs(np.asarray(a8, np.float32) - np.asarray(fp, np.float32))) / rms
    assert rel < 0.05, rel


def test_w2a8_act_split_gelu_half():
    rng = np.random.default_rng(2)
    K, N, split = 256, 256, 128
    w = rng.integers(-1, 2, (K, N)).astype(np.float32)
    packed = pack_ternary(jnp.asarray(w))
    scale = rng.uniform(0.5, 1.5, (N,)).astype(np.float32)
    x = rng.normal(0, 1, (2, K)).astype(np.float32)
    got = quantized_matmul(
        jnp.asarray(x), packed, mode="ternary", scale=jnp.asarray(scale),
        a8=True, impl="xla", act="gelu_new", act_split=split,
    )
    plain = _ref_w2a8(x, w, scale)
    want = plain.copy()
    g = jax.nn.gelu(jnp.asarray(plain[:, split:]), approximate=True)
    want[:, split:] = np.asarray(g)
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=1e-4, atol=1e-4)


def test_quantize_activations_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 2, (4, 64)), jnp.float32)
    xq, xs = quantize_activations(x)
    assert xq.dtype == jnp.int8 and xs.shape == (4, 1)
    recon = np.asarray(xq, np.float32) * np.asarray(xs)
    np.testing.assert_allclose(recon, np.asarray(x), atol=float(np.max(np.asarray(xs))) / 2 + 1e-6)


def test_int8_matmul_fallback():
    rng = np.random.default_rng(4)
    K, N = 128, 256
    w = rng.normal(0, 0.02, (K, N)).astype(np.float32)
    p8 = quantize_linear_int8({"w": jnp.asarray(w), "b": jnp.zeros((N,), jnp.float32)})
    assert p8["w_q"].dtype == jnp.int8
    x = jnp.asarray(rng.normal(0, 1, (2, K)), jnp.float32)
    got = int8_matmul(x, p8["w_q"], p8["scale"], p8["b"], impl="xla")
    want = np.asarray(x) @ w
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=0.05, atol=0.02)


def test_lm_head_int8_in_forward():
    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    specs = phi.layer_specs(cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.hidden_size)) * 0.1
    ref_logits, _ = phi.forward(params, cfg, specs, emb)
    q = quantize_lm_head_int8(params)
    got_logits, _ = phi.forward(q, cfg, specs, emb)
    # int8 head: logits close; greedy tokens identical on this input
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=0.1, atol=0.05
    )
    assert np.array_equal(
        np.argmax(np.asarray(got_logits), -1), np.argmax(np.asarray(ref_logits), -1)
    )


def test_a8_spec_through_model_forward():
    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    from ternary_vllm_tpu.quant import QuantConfig, quantize_decoder_params
    from ternary_vllm_tpu.quant.quantize import pack_decoder_params

    qat, qs = quantize_decoder_params(params, cfg, QuantConfig(quantization="ternary"))
    packed_a8, ps_a8 = pack_decoder_params(qat, qs, a8=True)
    packed_fp, ps_fp = pack_decoder_params(qat, qs)
    assert ps_a8[0]["wqkv"].a8 and not ps_fp[0]["wqkv"].a8
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.hidden_size)) * 0.1
    la8, _ = phi.forward(packed_a8, cfg, ps_a8, emb)
    lfp, _ = phi.forward(packed_fp, cfg, ps_fp, emb)
    # same model, a8 activations: small perturbation only
    np.testing.assert_allclose(np.asarray(la8), np.asarray(lfp), rtol=0.2, atol=0.1)


@pytest.mark.skipif(not ON_TPU, reason="Pallas w2a8 kernel needs a TPU")
@pytest.mark.parametrize("mode", ["ternary", "binary"])
def test_w2a8_pallas_bit_exact_vs_fallback(mode):
    rng = np.random.default_rng(5)
    K, N = 2048, 512
    if mode == "ternary":
        w = rng.integers(-1, 2, (K, N)).astype(np.float32)
        packed = pack_ternary(jnp.asarray(w))
    else:
        w = np.where(rng.random((K, N)) < 0.5, -1.0, 1.0).astype(np.float32)
        packed = pack_binary(jnp.asarray(w))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (N,)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (1, K)), jnp.bfloat16)
    pallas = quantized_matmul(x, packed, mode=mode, scale=scale, a8=True)
    xla = quantized_matmul(x, packed, mode=mode, scale=scale, a8=True, impl="xla")
    np.testing.assert_array_equal(
        np.asarray(pallas, np.float32), np.asarray(xla, np.float32)
    )


@pytest.mark.skipif(not ON_TPU, reason="Pallas w8a8 kernel needs a TPU")
def test_w8a8_pallas_bit_exact_vs_fallback():
    rng = np.random.default_rng(6)
    K, N = 2048, 1024
    w_q = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (N,)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (1, K)), jnp.bfloat16)
    pallas = int8_matmul(x, w_q, scale)
    xla = int8_matmul(x, w_q, scale, impl="xla")
    np.testing.assert_array_equal(
        np.asarray(pallas, np.float32), np.asarray(xla, np.float32)
    )


def test_fuse_preserves_a8():
    """fuse_packed_decoder_params: a8 survives on both fused kernels
    (in_proj via act_split; out2 via the dual w2a8 kernel)."""
    from ternary_vllm_tpu.quant.quantize import (
        QuantConfig,
        fuse_packed_decoder_params,
        pack_decoder_params,
        quantize_decoder_params,
    )

    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg)
    qat, qspecs = quantize_decoder_params(params, cfg, QuantConfig())
    packed, pspecs = pack_decoder_params(qat, qspecs, k_multiple=4, a8=True)
    fused, fspecs = fuse_packed_decoder_params(packed, pspecs)
    assert all(s["in_proj"].a8 and s["out2"].a8 for s in fspecs)

    # fused-a8 forward stays close to unfused-a8 (same weights; the fused
    # epilogues are exact, only int8 rounding of the two sources differs)
    ids = jnp.asarray([[3, 1, 4, 1]])
    emb = phi.embed_tokens(packed, ids)
    ref, _ = phi.forward(packed, cfg, pspecs, emb, None, 0)
    got, _ = phi.forward(fused, cfg, fspecs, emb, None, 0)
    a, b = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    assert np.mean(np.abs(a - b)) < 0.05 * (np.mean(np.abs(b)) + 1e-6)


def test_dual_w2a8_fallback_matches_composed_math():
    """dual a8 == two independent w2a8 matmuls summed (same int math)."""
    from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul

    rng = np.random.default_rng(1)
    K1, K2, N = 128, 256, 128
    w1 = rng.integers(-1, 2, (K1, N)).astype(np.float32)
    w2 = rng.integers(-1, 2, (K2, N)).astype(np.float32)
    pk = jnp.concatenate([pack_ternary(jnp.asarray(w1)), pack_ternary(jnp.asarray(w2))])
    s1v, s2v = (rng.uniform(0.5, 1.5, (N,)).astype(np.float32) for _ in range(2))
    b1v, b2v = (rng.normal(0, 0.1, (N,)).astype(np.float32) for _ in range(2))
    x1 = jnp.asarray(rng.normal(0, 1, (2, K1)), jnp.float32)
    x2 = jnp.asarray(rng.normal(0, 1, (2, K2)), jnp.float32)

    got = dual_ternary_matmul(
        x1, x2, pk, K1 // 4, jnp.asarray(s1v), jnp.asarray(b1v),
        jnp.asarray(s2v), jnp.asarray(b2v), clip_val=100.0, a8=True, impl="xla",
    )
    def ref_one(x, w, s, b):
        xf = np.asarray(x, np.float32)
        amax = np.maximum(np.abs(xf).max(axis=-1, keepdims=True), 1e-6)
        xs = amax / 127.0
        xq = np.clip(np.round(xf / xs), -127, 127).astype(np.int32)
        acc = xq @ w.astype(np.int32)
        return np.clip(acc.astype(np.float32) * xs * s[None, :] + b[None, :], -100, 100)

    want = ref_one(x1, w1, s1v, b1v) + ref_one(x2, w2, s2v, b2v)
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="needs TPU (bitcast + int8 MXU)")
def test_dual_w2a8_pallas_bit_exact_vs_fallback():
    from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul

    rng = np.random.default_rng(2)
    K1, K2, N = 512, 2048, 128
    w1 = rng.integers(-1, 2, (K1, N)).astype(np.float32)
    w2 = rng.integers(-1, 2, (K2, N)).astype(np.float32)
    pk = jnp.concatenate([pack_ternary(jnp.asarray(w1)), pack_ternary(jnp.asarray(w2))])
    s1v, s2v = (jnp.asarray(rng.uniform(0.5, 1.5, (N,)), jnp.float32) for _ in range(2))
    b1v, b2v = (jnp.asarray(rng.normal(0, 0.1, (N,)), jnp.float32) for _ in range(2))
    x1 = jnp.asarray(rng.normal(0, 1, (2, K1)), jnp.bfloat16)
    x2 = jnp.asarray(rng.normal(0, 1, (2, K2)), jnp.bfloat16)

    kw = dict(clip_val=100.0, a8=True)
    got = dual_ternary_matmul(x1, x2, pk, K1 // 4, s1v, b1v, s2v, b2v, **kw)
    ref = dual_ternary_matmul(x1, x2, pk, K1 // 4, s1v, b1v, s2v, b2v, impl="xla", **kw)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_w2a8_block_picker_respects_vmem():
    """VMEM-aware (bs, bn) choice: full-width tiles at decode (bm=1), backed
    off at prefill (bm=64+) — the fused in_proj (K=2048, N=14336) previously
    picked bn=N at bm=64 and blew the 16MB scoped-vmem limit."""
    from ternary_vllm_tpu.ops.ternary_matmul import _pick_w2a8_blocks

    def vmem(bm, kp, bs, bn, n_acc=1):
        # bf16 x double-buffered + int8 xq scratch + out/acc + packed blocks
        return bm * kp * 5 + bm * bn * (4 + 4 * n_acc) + 5 * bs * bn

    # decode: bm=1 keeps the full-width streaming layout
    bm, bs, bn = _pick_w2a8_blocks(1, 2048, 512, 14336)
    assert bm == 1 and bn == 14336 and 512 % bs == 0
    # prefill: bm=64 must back off below the scoped limit
    bm, bs, bn = _pick_w2a8_blocks(64, 2048, 512, 14336)
    assert vmem(bm, 2048, bs, bn) <= 10 * 1024 * 1024
    assert 14336 % bn == 0 and 512 % bs == 0
    # dual kernel (two accumulators) at prefill
    bm, bs, bn = _pick_w2a8_blocks(128, 10240, 512, 2048, n_acc=2)
    assert vmem(bm, 10240, bs, bn, n_acc=2) <= 10 * 1024 * 1024
    assert 2048 % bn == 0 and 512 % bs == 0
    # very large fused K (7B dual: K1+K2 = 20480): the x block alone would
    # bust scoped VMEM at bm=128 -> bm shrinks instead of OOMing at compile
    bm, bs, bn = _pick_w2a8_blocks(128, 20480, 256, 4096, n_acc=2)
    assert bm < 128
    assert bm * 20480 * 5 <= 5 * 1024 * 1024
    assert vmem(bm, 20480, bs, bn, n_acc=2) <= 10 * 1024 * 1024


def test_compare_quantization_a8_gate():
    """eval harness runs the a8 + int8-head path and reports finite deltas."""
    from ternary_vllm_tpu.eval.perplexity import compare_quantization
    from ternary_vllm_tpu.quant.quantize import QuantConfig

    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16))
    batches = [
        {"input_ids": jnp.asarray(ids[:2]), "labels": jnp.asarray(ids[:2])},
        {"input_ids": jnp.asarray(ids[2:]), "labels": jnp.asarray(ids[2:])},
    ]
    rep = compare_quantization(
        params, cfg, batches, QuantConfig(), a8=True, int8_head=True
    )
    assert np.isfinite(rep["quant_loss"]) and np.isfinite(rep["rel_ppl_increase"])


def test_compare_quantization_q4_head_gate():
    """The w4a8 (planar-int4) lm_head — the flagship bench config — passes the
    eval gate: its extra quantization error over the w8a8 head is negligible
    (per-channel symmetric absmax at 4 bits on the vocab projection)."""
    from ternary_vllm_tpu.eval.perplexity import compare_quantization
    from ternary_vllm_tpu.quant.quantize import QuantConfig

    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16))
    batches = [
        {"input_ids": jnp.asarray(ids[:2]), "labels": jnp.asarray(ids[:2])},
        {"input_ids": jnp.asarray(ids[2:]), "labels": jnp.asarray(ids[2:])},
    ]
    rep8 = compare_quantization(
        params, cfg, batches, QuantConfig(), a8=True, head_fmt="q8"
    )
    rep4 = compare_quantization(
        params, cfg, batches, QuantConfig(), a8=True, head_fmt="q4"
    )
    assert np.isfinite(rep4["quant_loss"]) and np.isfinite(rep4["rel_ppl_increase"])
    # int4-head loss within 2% (absolute nats) of the int8-head loss: the
    # ternary decoder quantization dominates; the head format is not the gate
    assert abs(rep4["quant_loss"] - rep8["quant_loss"]) < 0.02 * max(1.0, rep8["quant_loss"])


def _ln_np(x, s, b, eps=1e-5):
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (xf - mu) / np.sqrt(var + eps) * np.asarray(s, np.float32) + np.asarray(b, np.float32)


def test_quantized_matmul_ln_fusion_matches_explicit_ln():
    """ln= kwarg == explicit LayerNorm then quantized_matmul (fallback path)."""
    rng = np.random.default_rng(7)
    K, N = 256, 128
    w = rng.integers(-1, 2, (K, N)).astype(np.float32)
    packed = pack_ternary(jnp.asarray(w))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (N,)), jnp.float32)
    lns = jnp.asarray(rng.uniform(0.5, 1.5, (K,)), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.1, (K,)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (3, K)), jnp.float32)

    for a8 in (False, True):
        fused = quantized_matmul(
            x, packed, mode="ternary", scale=scale, clip_val=100.0,
            a8=a8, ln=(lns, lnb), ln_eps=1e-5, impl="xla",
        )
        h = jnp.asarray(_ln_np(x, lns, lnb), jnp.float32)
        explicit = quantized_matmul(
            x=h, packed=packed, mode="ternary", scale=scale, clip_val=100.0,
            a8=a8, impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(explicit, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_quantized_matmul_ln_rejects_padded_k():
    packed = pack_ternary(jnp.zeros((256, 128)))
    x = jnp.zeros((2, 200))  # K < packed capacity -> zero-padding breaks LN
    with pytest.raises(ValueError, match="ln fusion"):
        quantized_matmul(
            x, packed, mode="ternary", ln=(jnp.ones(200), jnp.zeros(200)),
        )


def test_dual_matmul_residual_fusion():
    """residual= kwarg == dual matmul then + residual, both a8 and bf16."""
    from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul

    rng = np.random.default_rng(8)
    K1, K2, N = 128, 256, 128
    w1 = rng.integers(-1, 2, (K1, N)).astype(np.float32)
    w2 = rng.integers(-1, 2, (K2, N)).astype(np.float32)
    pk = jnp.concatenate([pack_ternary(jnp.asarray(w1)), pack_ternary(jnp.asarray(w2))])
    s1v = jnp.asarray(rng.uniform(0.5, 1.5, (N,)), jnp.float32)
    s2v = jnp.asarray(rng.uniform(0.5, 1.5, (N,)), jnp.float32)
    b1v = jnp.zeros((N,), jnp.float32)
    b2v = jnp.zeros((N,), jnp.float32)
    x1 = jnp.asarray(rng.normal(0, 1, (2, K1)), jnp.float32)
    x2 = jnp.asarray(rng.normal(0, 1, (2, K2)), jnp.float32)
    res = jnp.asarray(rng.normal(0, 1, (2, N)), jnp.float32)

    for a8 in (False, True):
        with_res = dual_ternary_matmul(
            x1, x2, pk, K1 // 4, s1v, b1v, s2v, b2v, a8=a8, residual=res, impl="xla",
        )
        without = dual_ternary_matmul(
            x1, x2, pk, K1 // 4, s1v, b1v, s2v, b2v, a8=a8, impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(with_res), np.asarray(without + res), rtol=1e-6, atol=1e-6
        )


def test_int8_matmul_ln_fusion():
    rng = np.random.default_rng(9)
    K, N = 128, 256
    w = rng.normal(0, 0.02, (K, N)).astype(np.float32)
    p8 = quantize_linear_int8({"w": jnp.asarray(w), "b": jnp.zeros((N,), jnp.float32)})
    lns = jnp.asarray(rng.uniform(0.5, 1.5, (K,)), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.1, (K,)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, K)), jnp.float32)
    fused = int8_matmul(x, p8["w_q"], p8["scale"], p8["b"], impl="xla", ln=(lns, lnb))
    h = jnp.asarray(_ln_np(x, lns, lnb), jnp.float32)
    explicit = int8_matmul(h, p8["w_q"], p8["scale"], p8["b"], impl="xla")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(explicit), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# w4a8 (planar int4) path
# ---------------------------------------------------------------------------


def test_int4_planar_roundtrip():
    from ternary_vllm_tpu.ops.packing import pack_int4_planar, unpack_int4_planar

    rng = np.random.default_rng(10)
    for k in (6, 128, 257):  # odd K exercises padding
        q = rng.integers(-7, 8, (k, 8)).astype(np.float32)
        packed = pack_int4_planar(jnp.asarray(q))
        assert packed.shape == ((k + 1) // 2, 8) and packed.dtype == jnp.uint8
        back = unpack_int4_planar(packed, k)
        np.testing.assert_array_equal(np.asarray(back), q)


def test_int4_matmul_fallback_matches_reference_math():
    from ternary_vllm_tpu.ops.ternary_matmul import int4_matmul
    from ternary_vllm_tpu.quant.quantize import quantize_linear_int4

    rng = np.random.default_rng(11)
    K, N = 128, 256
    w = rng.normal(0, 0.02, (K, N)).astype(np.float32)
    p4 = quantize_linear_int4({"w": jnp.asarray(w), "b": jnp.zeros((N,), jnp.float32)})
    assert p4["w_q4p"].shape == (K // 2, N)
    x = jnp.asarray(rng.normal(0, 1, (2, K)), jnp.float32)
    got = int4_matmul(x, p4["w_q4p"], p4["scale"], p4["b"], impl="xla")
    want = np.asarray(x) @ w
    # int4 weights + int8 activations: coarse but unbiased
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=0.25, atol=0.12)


def test_int4_matmul_exact_integer_math():
    """Kernel math identity: xq @ (codes - 8) == xq @ codes - 8*rowsum(xq)."""
    from ternary_vllm_tpu.ops.packing import pack_int4_planar, unpack_int4_planar
    from ternary_vllm_tpu.ops.ternary_matmul import int4_matmul

    rng = np.random.default_rng(12)
    K, N = 64, 128
    q = rng.integers(-7, 8, (K, N)).astype(np.float32)
    packed = pack_int4_planar(jnp.asarray(q))
    scale = jnp.ones((N,), jnp.float32)
    x = jnp.asarray(rng.integers(-50, 50, (3, K)).astype(np.float32))
    got = int4_matmul(x, packed, scale, impl="xla")
    # x is already integer-valued with |x| <= 127 after per-row quantization
    # rescale: xq = round(x / xs) with xs = max|x|/127 -> got = xq@q * xs
    xf = np.asarray(x, np.float32)
    xs = np.maximum(np.abs(xf).max(-1, keepdims=True), 1e-6) / 127.0
    xq = np.clip(np.round(xf / xs), -127, 127)
    want = (xq @ q) * xs
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(not ON_TPU, reason="Pallas w4a8 kernel needs a TPU")
def test_w4a8_pallas_bit_exact_vs_fallback():
    from ternary_vllm_tpu.ops.packing import pack_int4_planar
    from ternary_vllm_tpu.ops.ternary_matmul import int4_matmul

    rng = np.random.default_rng(13)
    K, N = 2048, 512
    q = rng.integers(-7, 8, (K, N)).astype(np.float32)
    packed = pack_int4_planar(jnp.asarray(q))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (N,)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (1, K)), jnp.bfloat16)
    pallas = int4_matmul(x, packed, scale)
    xla = int4_matmul(x, packed, scale, impl="xla")
    np.testing.assert_array_equal(
        np.asarray(pallas, np.float32), np.asarray(xla, np.float32)
    )


def test_lm_head_int4_in_forward():
    from ternary_vllm_tpu.quant.quantize import quantize_lm_head_int4

    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    specs = phi.layer_specs(cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.hidden_size)) * 0.1
    ref_logits, _ = phi.forward(params, cfg, specs, emb)
    q = quantize_lm_head_int4(params)
    got_logits, _ = phi.forward(q, cfg, specs, emb)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=0.5, atol=0.2
    )
    # greedy tokens: int4 head should preserve most top-1 choices on this input
    same = np.mean(
        np.argmax(np.asarray(got_logits), -1) == np.argmax(np.asarray(ref_logits), -1)
    )
    assert same >= 0.8, f"int4 head flipped too many greedy tokens ({same:.0%} same)"
