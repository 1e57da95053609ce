"""Tensor-parallel packed decode (shard_map): token-exact parity with the
single-device packed model on a 4-way CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi, phi_tp
from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    pack_decoder_params,
    quantize_decoder_params,
)

CFG = phi.TINY_PHI_CONFIG  # 4 heads / hidden 64 -> tp=4 gives 1 head/shard


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(dp=1, tp=4, devices=jax.devices()[:4], axis_names=("data", "model"))
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    packed, pspecs = pack_decoder_params(qat, qspecs, k_multiple=4)
    tp_params = phi_tp.make_tp_packed_params(qat, CFG, tp=4)
    return mesh, qat, packed, pspecs, tp_params


def test_qkv_regroup_roundtrip():
    d, tp = 8, 2
    arr = jnp.arange(3 * d)[None, :] * jnp.ones((4, 1))
    out = np.asarray(phi_tp._regroup_qkv_columns(arr, d, tp, 1))[0]
    # shard 0 gets q[0:4], k[0:4], v[0:4] == cols 0-3, 8-11, 16-19
    np.testing.assert_array_equal(out[:12], [0, 1, 2, 3, 8, 9, 10, 11, 16, 17, 18, 19])


def test_tp_decode_matches_single_device(setup):
    mesh, qat, packed, pspecs, tp_params = setup
    tp_sharded = phi_tp.shard_tp_params(tp_params, mesh)
    step = phi_tp.make_tp_decode_step(CFG, mesh)

    cache = phi.init_cache(CFG, 1, 16, jnp.float32)
    cache = phi_tp.shard_tp_cache(cache, mesh)

    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (1, 5)))
    emb = phi.embed_tokens(tp_params, ids)

    # prefill via the sharded step (t=5), then 3 decode steps
    logits, cache = step(tp_sharded, cache, emb, jnp.int32(0))
    toks = [phi_tp.tp_greedy_token(logits[:, -1], mesh)]
    for i in range(3):
        e = phi.embed_tokens(tp_params, toks[-1][:, None])
        logits, cache = step(tp_sharded, cache, e, jnp.int32(5 + i))
        toks.append(phi_tp.tp_greedy_token(logits[:, -1], mesh))
    tp_tokens = [int(t[0]) for t in toks]

    # single-device reference
    ref_cache = phi.init_cache(CFG, 1, 16, jnp.float32)
    ref_logits, ref_cache = phi.forward(
        packed, CFG, pspecs, phi.embed_tokens(packed, ids), ref_cache, 0
    )
    ref_toks = [int(jnp.argmax(ref_logits[0, -1]))]
    for i in range(3):
        e = phi.embed_tokens(packed, jnp.asarray([[ref_toks[-1]]]))
        ref_logits, ref_cache = phi.forward(packed, CFG, pspecs, e, ref_cache, 5 + i)
        ref_toks.append(int(jnp.argmax(ref_logits[0, -1])))

    assert tp_tokens == ref_toks


def test_tp_decode_a8_close_to_single_device(setup):
    """w2a8 TP: per-shard activation quantization (row-local absmax differs
    from the single-device full-row absmax on row-parallel inputs), so logits
    are close, not bit-equal."""
    import dataclasses

    mesh, qat, packed, pspecs, tp_params = setup
    tp_sharded = phi_tp.shard_tp_params(tp_params, mesh)
    step = phi_tp.make_tp_decode_step(CFG, mesh, a8=True)
    cache = phi_tp.shard_tp_cache(phi.init_cache(CFG, 1, 16, jnp.float32), mesh)
    ids = jnp.asarray([[3, 1, 4, 1, 5]])
    emb = phi.embed_tokens(tp_params, ids)
    logits, _ = step(tp_sharded, cache, emb, jnp.int32(0))

    a8_specs = tuple(
        {n: (dataclasses.replace(s, a8=True) if s.kind == "packed" else s)
         for n, s in layer.items()}
        for layer in pspecs
    )
    ref_cache = phi.init_cache(CFG, 1, 16, jnp.float32)
    ref_logits, _ = phi.forward(
        packed, CFG, a8_specs, phi.embed_tokens(packed, ids), ref_cache, 0
    )
    a = np.asarray(logits, np.float32)
    b = np.asarray(ref_logits, np.float32)
    assert np.mean(np.abs(a - b)) < 0.05 * (np.mean(np.abs(b)) + 1e-6)
    # greedy tokens agree at the last position
    assert int(np.argmax(a[0, -1])) == int(np.argmax(b[0, -1]))


def test_tp_logits_close(setup):
    mesh, qat, packed, pspecs, tp_params = setup
    tp_sharded = phi_tp.shard_tp_params(tp_params, mesh)
    step = phi_tp.make_tp_decode_step(CFG, mesh)
    cache = phi_tp.shard_tp_cache(phi.init_cache(CFG, 1, 16, jnp.float32), mesh)
    ids = jnp.asarray([[3, 1, 4]])
    emb = phi.embed_tokens(tp_params, ids)
    logits, _ = step(tp_sharded, cache, emb, jnp.int32(0))

    ref_cache = phi.init_cache(CFG, 1, 16, jnp.float32)
    ref_logits, _ = phi.forward(
        packed, CFG, pspecs, phi.embed_tokens(packed, ids), ref_cache, 0
    )
    np.testing.assert_allclose(
        np.asarray(logits, np.float32), np.asarray(ref_logits, np.float32),
        rtol=1e-4, atol=1e-4,
    )
