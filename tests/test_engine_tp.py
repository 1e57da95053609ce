"""Tensor-parallel continuous-batching engine (BASELINE.md config 5): the
Engine over a 4-way CPU mesh produces the same tokens as the single-chip
engine, including prefix-cache admission and burst decode."""

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
from ternary_vllm_tpu.serve.engine import Engine

CFG = phi.TINY_PHI_CONFIG


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(dp=1, tp=4, devices=jax.devices()[:4], axis_names=("data", "model"))
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    packed, pspecs = pack_decoder_params(qat, qspecs, k_multiple=4)
    packed = quantize_lm_head_int8(packed)
    tp_params = phi_tp.shard_tp_params(
        phi_tp.make_tp_packed_params(qat, CFG, tp=4), mesh
    )
    return mesh, packed, pspecs, tp_params


def _run_engine(eng, params, prompts, max_new=6, **add_kw):
    for p in prompts:
        eng.add_request(phi.embed_tokens(params, p), max_new_tokens=max_new, **add_kw)
    return [r.tokens for r in sorted(eng.run(), key=lambda r: r.request_id)]


def test_tp_engine_matches_single_chip(setup):
    mesh, packed, pspecs, tp_params = setup
    prompts = [jnp.asarray([[5, 6, 7]]), jnp.asarray([[9, 1, 2, 3, 4]])]

    ref = _run_engine(
        Engine(packed, CFG, pspecs, max_batch=2, max_len=64, buckets=(8,)),
        packed, prompts,
    )
    got = _run_engine(
        Engine(tp_params, CFG, None, max_batch=2, max_len=64, buckets=(8,), mesh=mesh),
        tp_params, prompts,
    )
    assert got == ref


def test_tp_engine_burst(setup):
    mesh, packed, pspecs, tp_params = setup
    prompts = [jnp.asarray([[5, 6, 7]]), jnp.asarray([[9, 1, 2, 3, 4]])]
    ref = _run_engine(
        Engine(packed, CFG, pspecs, max_batch=2, max_len=64, buckets=(8,)),
        packed, prompts, max_new=7,
    )
    got = _run_engine(
        Engine(
            tp_params, CFG, None, max_batch=2, max_len=64, buckets=(8,),
            mesh=mesh, burst=4,
        ),
        tp_params, prompts, max_new=7,
    )
    assert got == ref


def test_tp_engine_prefix_cache(setup):
    mesh, packed, pspecs, tp_params = setup
    full = jnp.asarray([[5, 6, 7, 8, 9, 10]])

    eng = Engine(tp_params, CFG, None, max_batch=2, max_len=64, buckets=(4, 8), mesh=mesh)
    eng.add_request(phi.embed_tokens(tp_params, full), max_new_tokens=5)
    ref_tokens = eng.run()[0].tokens

    eng2 = Engine(tp_params, CFG, None, max_batch=2, max_len=64, buckets=(4, 8), mesh=mesh)
    pid = eng2.register_prefix(phi.embed_tokens(tp_params, full[:, :4]))
    eng2.add_request(
        phi.embed_tokens(tp_params, full[:, 4:]), max_new_tokens=5, prefix_id=pid
    )
    assert eng2.run()[0].tokens == ref_tokens


def test_tp_engine_int8_cache(setup):
    """TP engine with the int8 KV cache (head-sharded codes + lane-major
    scales) still matches the single-chip int8 engine."""
    mesh, packed, pspecs, tp_params = setup
    prompts = [jnp.asarray([[5, 6, 7]])]
    ref = _run_engine(
        Engine(
            packed, CFG, pspecs, max_batch=2, max_len=64, buckets=(8,),
            cache_dtype="int8",
        ),
        packed, prompts,
    )
    got = _run_engine(
        Engine(
            tp_params, CFG, None, max_batch=2, max_len=64, buckets=(8,),
            mesh=mesh, cache_dtype="int8",
        ),
        tp_params, prompts,
    )
    assert got == ref
