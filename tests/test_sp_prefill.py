"""Sequence-parallel (ring) prefill integrated into the decoder stack, and
the long-context pipeline: sequence-sharded prefill → fixed-capacity cache →
head-sharded / single-chip decode at positions beyond the reference's 2048
ceiling (VERDICT r1 item 7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi, phi_tp
from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.parallel.sp_prefill import sp_prefill, sp_prefill_to_cache
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    pack_decoder_params,
    quantize_decoder_params,
    quantize_lm_head_int8,
)

CFG = phi.TINY_PHI_CONFIG


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, tp=4, devices=jax.devices()[:4], axis_names=("data", "model"))


@pytest.fixture(scope="module")
def packed():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    p, s = pack_decoder_params(qat, qspecs, k_multiple=4)
    return quantize_lm_head_int8(p), s, qat


def test_sp_prefill_matches_single_chip(mesh, packed):
    params, specs, _ = packed
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (1, 32)))
    emb = phi.embed_tokens(params, ids)

    logits, ks, vs = sp_prefill(params, CFG, specs, emb, mesh)

    ref_cache = phi.init_cache(CFG, 1, 32, jnp.float32)
    ref_logits, ref_cache = phi.forward(
        params, CFG, phi.freeze_specs(specs), emb, ref_cache, jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(logits, np.float32), np.asarray(ref_logits, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    for i, (ck, cv) in enumerate(ref_cache):
        np.testing.assert_allclose(
            np.asarray(ks[i], np.float32), np.asarray(ck, np.float32),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(vs[i], np.float32), np.asarray(cv, np.float32),
            rtol=2e-4, atol=2e-4,
        )


def test_sp_prefill_to_cache_then_decode(mesh, packed):
    """Ring prefill feeds a decode cache: greedy continuation equals the
    single-chip prefill+decode continuation."""
    params, specs, _ = packed
    frozen = phi.freeze_specs(specs)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (1, 16)))
    emb = phi.embed_tokens(params, ids)

    last, cache, t = sp_prefill_to_cache(params, CFG, specs, emb, mesh, max_len=32)
    toks = [int(jnp.argmax(last[0]))]
    for i in range(3):
        e = phi.embed_tokens(params, jnp.asarray([[toks[-1]]]))
        logits, cache = phi.forward(params, CFG, frozen, e, cache, t + i)
        toks.append(int(jnp.argmax(logits[0, -1])))

    ref_cache = phi.init_cache(CFG, 1, 32, jnp.bfloat16)
    ref_logits, ref_cache = phi.forward(params, CFG, frozen, emb, ref_cache, jnp.int32(0))
    ref = [int(jnp.argmax(ref_logits[0, -1]))]
    for i in range(3):
        e = phi.embed_tokens(params, jnp.asarray([[ref[-1]]]))
        logits, ref_cache = phi.forward(params, CFG, frozen, e, ref_cache, 16 + i)
        ref.append(int(jnp.argmax(logits[0, -1])))
    assert toks == ref


LONG_CFG = dataclasses.replace(CFG, max_position_embeddings=8192)


def test_long_context_beyond_reference_ceiling(mesh, packed):
    """8k-class pipeline on the virtual mesh: a 4096-token prompt (2x the
    reference's context ceiling) ring-prefills sequence-sharded, then decodes
    at positions > 4096 — single-chip and head-sharded TP decode agree."""
    params, specs, qat = packed
    frozen = phi.freeze_specs(specs)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, CFG.vocab_size, (1, 4096)))
    emb = phi.embed_tokens(params, ids)

    last, cache, t = sp_prefill_to_cache(
        params, LONG_CFG, specs, emb, mesh, max_len=4096 + 128
    )
    assert t == 4096
    first = int(jnp.argmax(last[0]))

    # single-chip decode continuation at pos 4096..4098
    toks_sc = [first]
    c1 = cache
    for i in range(3):
        e = phi.embed_tokens(params, jnp.asarray([[toks_sc[-1]]]))
        logits, c1 = phi.forward(params, LONG_CFG, frozen, e, c1, t + i)
        toks_sc.append(int(jnp.argmax(logits[0, -1])))
    assert all(np.isfinite(tk) for tk in toks_sc)

    # head-sharded TP decode from the SAME ring-prefilled cache
    tp_params = phi_tp.shard_tp_params(
        phi_tp.make_tp_packed_params(qat, LONG_CFG, tp=4), mesh
    )
    tp_cache = phi_tp.shard_tp_cache(cache, mesh)
    step = phi_tp.make_tp_decode_step(LONG_CFG, mesh)
    toks_tp = [first]
    for i in range(3):
        e = phi.embed_tokens(tp_params, jnp.asarray([[toks_tp[-1]]]))
        logits, tp_cache = step(tp_params, tp_cache, e, jnp.int32(t + i))
        toks_tp.append(int(phi_tp.tp_greedy_token(logits[:, -1], mesh)[0]))
    assert toks_tp == toks_sc
