"""EnginePool: mixed-capacity serving (round-3 VERDICT weak #6 — one serving
surface handles 1 long + N short requests WITHOUT allocating N+1 full-length
KV caches)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.serve.engine import Engine
from ternary_vllm_tpu.serve.pool import EnginePool

CFG = phi.TINY_PHI_CONFIG


@pytest.fixture(scope="module")
def setup():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG)
    return params, specs


def _emb(params, n, seed=0):
    rng = np.random.default_rng(seed)
    return phi.embed_tokens(params, jnp.asarray(rng.integers(0, CFG.vocab_size, (1, n))))


def test_pool_routes_and_matches_single_engines(setup):
    """1 long + 3 short requests: routing by worst-case live length, outputs
    identical to dedicated engines, and KV HBM = short_slots*short_len +
    long_slots*long_len instead of (short_slots+long_slots)*long_len."""
    params, specs = setup
    kw = dict(buckets=(16,), cache_dtype="bf16", speculative=0)
    pool = EnginePool(params, CFG, specs, short_len=64, long_len=256,
                      short_slots=3, long_slots=1, **kw)
    long_emb = _emb(params, 40, seed=1)  # chunked (bucket 16) + needs > 64
    shorts = [_emb(params, 10, seed=s) for s in (2, 3, 4)]
    name, _ = pool.add_request(long_emb, max_new_tokens=30)
    assert name == "long"
    for s in shorts:
        name, _ = pool.add_request(s, max_new_tokens=8)
        assert name == "short"
    done = pool.run()
    assert len(done) == 4
    by_len = {len(r.tokens): r for r in done}

    ref_long = Engine(params, CFG, specs, max_batch=1, max_len=256, **kw)
    ref_long.add_request(long_emb, max_new_tokens=30)
    assert by_len[30].tokens == ref_long.run()[0].tokens

    ref_short = Engine(params, CFG, specs, max_batch=3, max_len=64, **kw)
    for s in shorts:
        ref_short.add_request(s, max_new_tokens=8)
    ref_tokens = sorted(tuple(r.tokens) for r in ref_short.run())
    got_tokens = sorted(tuple(r.tokens) for r in done if len(r.tokens) == 8)
    assert got_tokens == ref_tokens

    # the memory claim: pooled KV strictly smaller than uniform long-capacity
    pooled = phi.cache_bytes(CFG, 3, 64) + phi.cache_bytes(CFG, 1, 256)
    uniform = phi.cache_bytes(CFG, 4, 256)
    assert pooled < uniform / 2


def test_pool_prefix_works_in_both_classes(setup):
    params, specs = setup
    kw = dict(buckets=(16,), cache_dtype="bf16", speculative=0)
    pool = EnginePool(params, CFG, specs, short_len=64, long_len=256,
                      short_slots=2, long_slots=1, **kw)
    prefix = _emb(params, 12, seed=7)
    pid = pool.register_prefix(prefix)
    name_s, _ = pool.add_request(_emb(params, 8, seed=8), max_new_tokens=6, prefix_id=pid)
    name_l, _ = pool.add_request(_emb(params, 16, seed=9), max_new_tokens=40, prefix_id=pid)
    assert (name_s, name_l) == ("short", "long")
    done = pool.run()
    assert sorted(len(r.tokens) for r in done) == [6, 40]
    pool.drop_prefix(pid)
    with pytest.raises(KeyError):
        pool.add_request(_emb(params, 8), prefix_id=pid)


def test_pool_rejects_oversized(setup):
    params, specs = setup
    pool = EnginePool(params, CFG, specs, short_len=64, long_len=128,
                      short_slots=1, long_slots=1, buckets=(16,), speculative=0)
    with pytest.raises(ValueError, match="does not fit"):
        pool.add_request(_emb(params, 100), max_new_tokens=64)


def test_pool_long_only_prefix(setup):
    """A prefix past the short engine's CAPACITY registers long-only
    (ADVICE r4) and its requests route to the long class.  (Prefixes past
    the largest bucket but within capacity now chunk-register fine.)"""
    params, specs = setup
    kw = dict(buckets=(16,), cache_dtype="bf16", speculative=0)
    pool = EnginePool(params, CFG, specs, short_len=32, long_len=256,
                      short_slots=2, long_slots=1, **kw)
    prefix = _emb(params, 40, seed=11)  # needs 41 slots > short capacity 32
    pid = pool.register_prefix(prefix)
    assert pool._prefixes[pid][0] is None  # not on the short class
    name, _ = pool.add_request(_emb(params, 8, seed=12), max_new_tokens=4, prefix_id=pid)
    assert name == "long"
    done = pool.run()
    assert len(done) == 1 and len(done[0].tokens) == 4
    pool.drop_prefix(pid)  # must not raise on the short-side None id


def test_pool_boundary_routes_by_padded_sizes(setup):
    """A request whose RAW lengths fit the short class but whose prefix
    bucket + suffix bucket exceed it must route long instead of dying in
    _admit (ADVICE r4)."""
    params, specs = setup
    kw = dict(buckets=(16,), cache_dtype="bf16", speculative=0)
    pool = EnginePool(params, CFG, specs, short_len=24, long_len=256,
                      short_slots=2, long_slots=1, **kw)
    prefix = _emb(params, 9, seed=13)   # bucket 16
    pid = pool.register_prefix(prefix)
    # raw: 9 + 4 + 4 + 1 = 18 <= 24, padded: bucket(9)=16 + bucket(4)=16 > 24
    name, _ = pool.add_request(_emb(params, 4, seed=14), max_new_tokens=4, prefix_id=pid)
    assert name == "long"
    done = pool.run()
    assert len(done) == 1 and len(done[0].tokens) == 4
