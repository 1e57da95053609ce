"""Tensor-parallel packed decode (shard_map): token-exact parity with the
single-device packed model on a 4-way CPU mesh, through the SAME kernel stack
(fused-LN in_proj, fused decode attention, int8 lm_head) per shard."""

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
    quantize_lm_head_int8,
)

CFG = phi.TINY_PHI_CONFIG  # 4 heads / hidden 64 -> tp=4 gives 1 head/shard


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(dp=1, tp=4, devices=jax.devices()[:4], axis_names=("data", "model"))
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    packed, pspecs = pack_decoder_params(qat, qspecs, k_multiple=4)
    packed = quantize_lm_head_int8(packed)  # TP default: int8 vocab-sharded head
    tp_params = phi_tp.make_tp_packed_params(qat, CFG, tp=4)
    return mesh, qat, packed, pspecs, tp_params


def test_qkv_regroup_roundtrip():
    d, tp = 8, 2
    arr = jnp.arange(3 * d)[None, :] * jnp.ones((4, 1))
    out = np.asarray(phi_tp._regroup_qkv_columns(arr, (d, d, d), tp, 1))[0]
    # shard 0 gets q[0:4], k[0:4], v[0:4] == cols 0-3, 8-11, 16-19
    np.testing.assert_array_equal(out[:12], [0, 1, 2, 3, 8, 9, 10, 11, 16, 17, 18, 19])


def test_in_proj_grouping():
    """Shard s's equal N-split block must be [q_s|k_s|v_s|fc1_s]."""
    d, f, tp = 8, 16, 2
    qkv = jnp.arange(3 * d, dtype=jnp.float32)
    fc1 = 100 + jnp.arange(f, dtype=jnp.float32)
    out = np.asarray(phi_tp._group_in_proj(qkv, fc1, (d, d, d), f, tp, 0))
    width = (3 * d + f) // tp
    shard0 = out[:width]
    np.testing.assert_array_equal(
        shard0, [0, 1, 2, 3, 8, 9, 10, 11, 16, 17, 18, 19,
                 100, 101, 102, 103, 104, 105, 106, 107]
    )


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


def test_tp_decode_vector_positions(setup):
    """Per-slot position vectors (continuous batching) through the TP step."""
    mesh, qat, packed, pspecs, tp_params = setup
    tp_sharded = phi_tp.shard_tp_params(tp_params, mesh)
    step = phi_tp.make_tp_decode_step(CFG, mesh)

    # two rows prefilled to different lengths via the single-chip reference,
    # then one TP batched decode step with pos=(3, 5)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (2, 6)))
    ref_cache = phi.init_cache(CFG, 2, 16, jnp.float32)
    # row-by-row prefill into a batch-2 cache via vector positions at t=1 is
    # complex; instead run the same ops TP vs single-chip and compare
    cache = phi_tp.shard_tp_cache(phi.init_cache(CFG, 2, 16, jnp.float32), mesh)
    emb = phi.embed_tokens(tp_params, ids[:, :1])
    pos = jnp.asarray([3, 5], jnp.int32)
    logits, cache2 = step(tp_sharded, cache, emb, pos)

    ref_logits, ref_cache2 = phi.forward(
        packed, CFG, pspecs, phi.embed_tokens(packed, ids[:, :1]),
        phi.init_cache(CFG, 2, 16, jnp.float32), pos,
    )
    np.testing.assert_allclose(
        np.asarray(logits, np.float32), np.asarray(ref_logits, np.float32),
        rtol=2e-4, atol=2e-4,
    )
    # cache rows written at each row's own position
    k0 = np.asarray(cache2[0][0])
    rk0 = np.asarray(ref_cache2[0][0])
    np.testing.assert_allclose(k0[0, :, 3], rk0[0, :, 3], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(k0[1, :, 5], rk0[1, :, 5], rtol=2e-4, atol=2e-4)


def test_tp_int8_cache_matches_single_device(setup):
    """int8 4-tuple cache through the TP path (head-sharded codes + scales)."""
    mesh, qat, packed, pspecs, tp_params = setup
    tp_sharded = phi_tp.shard_tp_params(tp_params, mesh)
    step = phi_tp.make_tp_decode_step(CFG, mesh)

    cache = phi_tp.shard_tp_cache(phi.init_cache(CFG, 1, 16, "int8"), mesh)
    ids = jnp.asarray([[7, 3, 9]])
    emb = phi.embed_tokens(tp_params, ids)
    logits, cache = step(tp_sharded, cache, emb, jnp.int32(0))
    tok = phi_tp.tp_greedy_token(logits[:, -1], mesh)
    e = phi.embed_tokens(tp_params, tok[:, None])
    logits2, cache = step(tp_sharded, cache, e, jnp.int32(3))

    ref_cache = phi.init_cache(CFG, 1, 16, "int8")
    ref_logits, ref_cache = phi.forward(
        packed, CFG, pspecs, phi.embed_tokens(packed, ids), ref_cache, 0
    )
    rt = int(jnp.argmax(ref_logits[0, -1]))
    assert int(tok[0]) == rt
    ref_logits2, _ = phi.forward(
        packed, CFG, pspecs, phi.embed_tokens(packed, jnp.asarray([[rt]])), ref_cache, 3
    )
    # int8 KV amplifies benign f32 summation-order differences (a code can
    # flip by 1 near a rounding boundary), so match the single-chip int8
    # tests' tolerance (see test_int8_kv.py) and assert the greedy token
    np.testing.assert_allclose(
        np.asarray(logits2, np.float32), np.asarray(ref_logits2, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    assert int(jnp.argmax(logits2[0, -1])) == int(jnp.argmax(ref_logits2[0, -1]))


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


def test_tp_relayout_from_packed_artifact(setup):
    """Serving path: TP params built from a PACKED artifact (no latents)
    decode identically to TP params built from the QAT latents."""
    mesh, qat, packed, pspecs, tp_params = setup
    relayout = phi_tp.tp_relayout_packed_params(
        {
            "wte": packed["wte"],
            "layers": [
                {k: layer[k] for k in ("ln", "wqkv", "out_proj", "fc1", "fc2")}
                for layer in _unfused_packed(qat)
            ],
            "lm_head": packed["lm_head"],
        },
        CFG, tp=4,
    )
    a = phi_tp.shard_tp_params(tp_params, mesh)
    b = phi_tp.shard_tp_cache(phi.init_cache(CFG, 1, 16, jnp.float32), mesh)
    step = phi_tp.make_tp_decode_step(CFG, mesh)
    ids = jnp.asarray([[11, 5, 2]])
    emb = phi.embed_tokens(tp_params, ids)
    la, _ = step(a, b, emb, jnp.int32(0))

    c = phi_tp.shard_tp_params(relayout, mesh)
    d = phi_tp.shard_tp_cache(phi.init_cache(CFG, 1, 16, jnp.float32), mesh)
    lb, _ = step(c, d, emb, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(la, np.float32), np.asarray(lb, np.float32), rtol=1e-5, atol=1e-5
    )


def _unfused_packed(qat):
    """Pack each linear the standard (unfused, unpadded) way from latents."""
    from ternary_vllm_tpu.ops.packing import pack_ternary
    from ternary_vllm_tpu.ops.quantizers import tri_step_ste

    out = []
    for layer in qat["layers"]:
        entry = {"ln": layer["ln"]}
        for name in ("wqkv", "out_proj", "fc1", "fc2"):
            p = layer[name]
            entry[name] = {
                "packed": pack_ternary(tri_step_ste(p["latent"])),
                "scale": p["scale"],
                "b": p["b"],
            }
        out.append(entry)
    return out
