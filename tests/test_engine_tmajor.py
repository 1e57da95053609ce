"""T-major engine cache layout (round 4): long-context engines store KV
(B, KVH, hd, T) so decode attention streams unpadded bytes; admission
prefills row-major and transposes at the splice.  Token outputs must be
identical to the row-major layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.serve.engine import Engine, resolve_cache_layout

CFG = phi.TINY_PHI_CONFIG


@pytest.fixture(scope="module")
def setup():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    return params, phi.layer_specs(CFG)


def _prompt(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, CFG.vocab_size, (1, n)))


def test_resolve_cache_layout_policy():
    assert resolve_cache_layout("auto", 2048, 64, None) == "tmajor"
    assert resolve_cache_layout("auto", 8448, 64, None) == "tmajor"
    assert resolve_cache_layout("auto", 1024, 64, None) == "rowmajor"
    assert resolve_cache_layout("auto", 8448, 128, None) == "rowmajor"  # hd=128: no padding
    assert resolve_cache_layout("auto", 8448, 64, object()) == "rowmajor"  # TP
    assert resolve_cache_layout("rowmajor", 8448, 64, None) == "rowmajor"
    assert resolve_cache_layout("tmajor", 512, 64, None) == "tmajor"


def test_init_cache_tmajor_shapes():
    c = phi.init_cache(CFG, 2, 256, jnp.bfloat16, layout="tmajor")
    assert c[0][0].shape == (2, CFG.num_key_value_heads, CFG.head_dim, 256)
    ci = phi.init_cache(CFG, 2, 256, "int8", layout="tmajor")
    assert ci[0][0].shape == (2, CFG.num_key_value_heads, CFG.head_dim, 256)
    assert ci[0][1].shape == (2, CFG.num_key_value_heads, 1, 256)  # scales unchanged
    # transpose_cache round-trips
    back = phi.transpose_cache(phi.transpose_cache(c))
    assert back[0][0].shape == c[0][0].shape


@pytest.mark.parametrize("cache_dtype", ["bf16", "int8"])
def test_tmajor_engine_matches_rowmajor(setup, cache_dtype):
    params, specs = setup
    prompts = [_prompt(5, 1), _prompt(40, 2)]  # bucketed + chunked admission

    def run(layout):
        eng = Engine(params, CFG, specs, max_batch=2, max_len=2048,
                     buckets=(8, 32), cache_dtype=cache_dtype,
                     cache_layout=layout, speculative=0)
        for p in prompts:
            eng.add_request(phi.embed_tokens(params, p), max_new_tokens=8)
        done = sorted(eng.run(), key=lambda r: r.request_id)
        return [r.tokens for r in done]

    assert run("tmajor") == run("rowmajor")


def test_tmajor_engine_default_auto(setup):
    params, specs = setup
    eng = Engine(params, CFG, specs, max_batch=1, max_len=2048, buckets=(8,))
    assert eng.cache_layout == "tmajor"
    # round-5: T-major engines KEEP adaptive speculation (verify windows run
    # on the T-major small-chunk kernel)
    assert eng.spec_k == 4
    assert eng.cache[0][0].shape[2] == CFG.head_dim
    eng = Engine(params, CFG, specs, max_batch=1, max_len=256, buckets=(8,))
    assert eng.cache_layout == "rowmajor"


@pytest.mark.parametrize("cache_dtype", ["bf16", "int8"])
def test_tmajor_spec_lossless(setup, cache_dtype):
    """Speculation on a T-major engine is lossless-greedy: same tokens as a
    plain row-major engine (round-4 VERDICT weak #4)."""
    params, specs = setup
    ids = _prompt(12, 5)
    emb = phi.embed_tokens(params, ids)

    ref = Engine(params, CFG, specs, max_batch=1, max_len=2048, buckets=(8, 32),
                 cache_dtype=cache_dtype, cache_layout="rowmajor", speculative=0)
    ref.add_request(emb, max_new_tokens=24)
    ref_tokens = ref.run()[0].tokens

    eng = Engine(params, CFG, specs, max_batch=1, max_len=2048, buckets=(8, 32),
                 cache_dtype=cache_dtype, cache_layout="tmajor", speculative=4)
    eng.add_request(emb, max_new_tokens=24, prompt_ids=np.asarray(ids))
    done = eng.run()
    assert done[0].tokens == ref_tokens
    assert eng.stats["spec_verify_steps"] > 0  # speculation actually ran


def test_tmajor_prefix_suffix(setup):
    params, specs = setup
    prefix = phi.embed_tokens(params, _prompt(6, 3))
    suffix = phi.embed_tokens(params, _prompt(20, 4))

    def run(layout):
        eng = Engine(params, CFG, specs, max_batch=1, max_len=2048,
                     buckets=(8, 32), cache_dtype="bf16",
                     cache_layout=layout, speculative=0)
        pid = eng.register_prefix(prefix)
        eng.add_request(suffix, max_new_tokens=6, prefix_id=pid)
        return eng.run()[0].tokens

    assert run("tmajor") == run("rowmajor")


def test_decoder_auto_tmajor_matches_rowmajor():
    """The Decoder surface picks T-major under the same policy as the Engine
    (max_len >= 2048, hd < 128) and emits identical greedy tokens — prefill
    runs row-major, the cache transposes once before the decode loop."""
    from ternary_vllm_tpu.serve.decode import Decoder

    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, CFG.vocab_size, (1, 12)))
    emb = phi.embed_tokens(params, ids)

    auto = Decoder(params, CFG, specs, max_len=2048)
    assert auto.cache_layout == "tmajor"
    toks_t, n_t, _ = auto.generate(emb, max_new_tokens=6)

    row = Decoder(params, CFG, specs, max_len=2048, cache_layout="rowmajor")
    assert row.cache_layout == "rowmajor"
    toks_r, n_r, _ = row.generate(emb, max_new_tokens=6)
    assert n_t == n_r
    np.testing.assert_array_equal(np.asarray(toks_t), np.asarray(toks_r))
