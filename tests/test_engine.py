"""Continuous-batching engine: multi-request correctness vs single-request
decode, slot reuse, per-slot positions."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.serve.decode import Decoder
from ternary_vllm_tpu.serve.engine import Engine

CFG = phi.TINY_PHI_CONFIG


def _setup():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG)
    return params, specs


def test_engine_single_request_matches_decoder():
    params, specs = _setup()
    prompt = jnp.asarray([[5, 6, 7]])
    emb = phi.embed_tokens(params, prompt)

    dec = Decoder(params, CFG, specs, max_len=64, cache_dtype=jnp.float32)
    ref_tokens, _, _ = dec.generate(emb, max_new_tokens=6)

    eng = Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(4, 8, 16))
    eng.add_request(emb, max_new_tokens=6)
    done = eng.run()
    assert len(done) == 1
    # engine caches are bf16 vs decoder f32 — tokens may diverge late; check
    # the first few greedy tokens agree
    np.testing.assert_array_equal(
        np.asarray(done[0].tokens[:3]), np.asarray(ref_tokens)[0][:3]
    )


def test_engine_concurrent_requests_isolated():
    """Two different prompts decoded concurrently must produce the same tokens
    as when decoded alone (slot isolation)."""
    params, specs = _setup()
    prompts = [jnp.asarray([[5, 6, 7]]), jnp.asarray([[9, 1, 2, 3, 4]])]
    solo = []
    for p in prompts:
        eng = Engine(params, CFG, specs, max_batch=1, max_len=64, buckets=(8,))
        eng.add_request(phi.embed_tokens(params, p), max_new_tokens=5)
        solo.append(eng.run()[0].tokens)

    eng = Engine(params, CFG, specs, max_batch=4, max_len=64, buckets=(8,))
    for p in prompts:
        eng.add_request(phi.embed_tokens(params, p), max_new_tokens=5)
    done = sorted(eng.run(), key=lambda r: r.request_id)
    assert [r.tokens for r in done] == solo


def test_engine_more_requests_than_slots():
    params, specs = _setup()
    eng = Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,))
    ids = []
    for i in range(5):
        p = jnp.asarray([[i + 1, i + 2]])
        ids.append(eng.add_request(phi.embed_tokens(params, p), max_new_tokens=4))
    done = eng.run()
    assert len(done) == 5
    assert sorted(r.request_id for r in done) == ids
    for r in done:
        assert 1 <= len(r.tokens) <= 4


def test_engine_eos_stops_early():
    params, specs = _setup()
    eng = Engine(params, CFG, specs, max_batch=1, max_len=64, buckets=(8,))
    p = jnp.asarray([[5, 6, 7]])
    # run once to find what token gets emitted, then use it as "eos"
    eng.add_request(phi.embed_tokens(params, p), max_new_tokens=4)
    toks = eng.run()[0].tokens
    eos = toks[1]
    eng2 = Engine(params, CFG, specs, max_batch=1, max_len=64, buckets=(8,))
    eng2.add_request(phi.embed_tokens(params, p), max_new_tokens=10, eos_id=eos)
    out = eng2.run()[0]
    assert out.tokens[-1] == eos
    assert len(out.tokens) == 2
