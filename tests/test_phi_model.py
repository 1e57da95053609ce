"""Phi decoder: shapes, cached-decode vs full-forward parity, quantization
passes (qat + packed), fused decode loop."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    pack_decoder_params,
    quantize_decoder_params,
    size_report,
)

CFG = phi.TINY_PHI_CONFIG


def _params():
    return phi.init_phi_params(jax.random.PRNGKey(0), CFG)


def _specs():
    return phi.layer_specs(CFG)


def test_forward_shapes():
    params = _params()
    ids = jnp.arange(10)[None, :] % CFG.vocab_size
    logits, cache = phi.forward_tokens(params, CFG, _specs(), ids)
    assert logits.shape == (1, 10, CFG.vocab_size)
    assert cache is None


def test_cached_decode_matches_full_forward():
    """Incremental decode through the fixed-capacity cache must equal the
    uncached full forward — the core KV-cache invariant."""
    params = _params()
    specs = _specs()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (2, 9)))
    full_logits, _ = phi.forward_tokens(params, CFG, specs, ids)

    cache = phi.init_cache(CFG, 2, 16, jnp.float32)
    # prefill 5, then decode 4 one at a time
    emb = phi.embed_tokens(params, ids)
    logits_a, cache = phi.forward(params, CFG, specs, emb[:, :5], cache, 0)
    step_logits = [logits_a]
    for t in range(5, 9):
        lg, cache = phi.forward(params, CFG, specs, emb[:, t : t + 1], cache, t)
        step_logits.append(lg)
    inc_logits = jnp.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc_logits), np.asarray(full_logits), rtol=2e-4, atol=2e-4
    )


def test_padding_mask_blocks_attention():
    params = _params()
    specs = _specs()
    ids = jnp.asarray([[3, 4, 5, 6]])
    mask_full = jnp.asarray([[True, True, True, True]])
    mask_pad = jnp.asarray([[True, False, True, True]])
    la, _ = phi.forward_tokens(params, CFG, specs, ids, attn_mask=mask_full)
    lb, _ = phi.forward_tokens(params, CFG, specs, ids, attn_mask=mask_pad)
    # masking position 1 must change logits at later positions
    assert not np.allclose(np.asarray(la[0, 3]), np.asarray(lb[0, 3]))


def test_quantize_then_pack_parity():
    """qat forward (STE on latent) and packed forward (uint8 kernel) must agree
    exactly: hard-quantized latents == unpacked planes."""
    params = _params()
    qc = QuantConfig(quantization="ternary", start_skip=1, last_skip=0)
    qat_params, qat_specs = quantize_decoder_params(params, CFG, qc)
    assert qat_specs[0]["fc1"].kind == "dense"  # start_skip
    assert qat_specs[1]["fc1"].kind == "qat"

    packed_params, packed_specs = pack_decoder_params(qat_params, qat_specs, k_multiple=4)
    assert packed_specs[1]["fc1"].kind == "packed"

    ids = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (1, 7)))
    lq, _ = phi.forward_tokens(qat_params, CFG, qat_specs, ids)
    lp, _ = phi.forward_tokens(packed_params, CFG, packed_specs, ids)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lp), rtol=2e-4, atol=2e-4)


def test_remove_blocks():
    params = _params()
    qc = QuantConfig(remove_blocks=(0,))
    qat_params, specs = quantize_decoder_params(params, CFG, qc)
    assert len(qat_params["layers"]) == CFG.num_hidden_layers - 1
    assert len(specs) == CFG.num_hidden_layers - 1
    small_cfg = phi.PhiConfig(
        **{**CFG.__dict__, "num_hidden_layers": CFG.num_hidden_layers - 1}
    )
    ids = jnp.asarray([[1, 2, 3]])
    logits, _ = phi.forward_tokens(qat_params, small_cfg, specs, ids)
    assert logits.shape == (1, 3, CFG.vocab_size)


def test_size_report():
    params = _params()
    qc = QuantConfig(quantization="ternary")
    qat_params, specs = quantize_decoder_params(params, CFG, qc)
    rep = size_report(qat_params, specs)
    assert rep["quantized_params"] > 0
    assert rep["total_gib"] < rep["fp16_gib"]


def test_decode_loop_greedy():
    from ternary_vllm_tpu.serve.decode import Decoder

    params = _params()
    dec = Decoder(params, CFG, _specs(), max_len=64, cache_dtype=jnp.float32)
    emb = phi.embed_tokens(params, jnp.asarray([[1, 2, 3]])).astype(jnp.float32)
    tokens, n, timing = dec.generate(emb, max_new_tokens=8)
    assert tokens.shape[0] == 1 and n == 8
    assert timing["tokens_per_s"] > 0

    # greedy decode must be deterministic
    tokens2, _, _ = dec.generate(emb, max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


def test_decode_loop_matches_teacher_forcing():
    """Fused while_loop decode == manually feeding argmax tokens through the
    full forward (golden-parity of the serving path)."""
    params = _params()
    specs = _specs()
    from ternary_vllm_tpu.serve.decode import Decoder

    prompt = jnp.asarray([[5, 6, 7]])
    dec = Decoder(params, CFG, specs, max_len=32, cache_dtype=jnp.float32)
    emb = phi.embed_tokens(params, prompt).astype(jnp.float32)
    tokens, n, _ = dec.generate(emb, max_new_tokens=5)

    # teacher-forcing reference: repeatedly run the FULL sequence, take argmax
    seq = list(np.asarray(prompt)[0])
    for _ in range(5):
        logits, _ = phi.forward_tokens(params, CFG, specs, jnp.asarray([seq]))
        seq.append(int(jnp.argmax(logits[0, -1])))
    np.testing.assert_array_equal(np.asarray(tokens)[0], np.asarray(seq[3:]))
