"""Burst decoding: K fused steps per scheduling point must produce the same
tokens as single-step scheduling (including eos-mid-burst and staggered
admission)."""

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.serve.engine import Engine

CFG = phi.TINY_PHI_CONFIG


def _setup():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    return params, phi.layer_specs(CFG)


def _run(burst, prompts, max_new=9, eos_id=-1):
    params, specs = _setup()
    eng = Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,), burst=burst)
    for p in prompts:
        eng.add_request(phi.embed_tokens(params, p), max_new_tokens=max_new, eos_id=eos_id)
    return sorted(eng.run(), key=lambda r: r.request_id)


def test_burst_matches_single_step():
    prompts = [jnp.asarray([[5, 6, 7]]), jnp.asarray([[9, 1, 2, 3]]), jnp.asarray([[4, 4]])]
    solo = [r.tokens for r in _run(1, prompts)]
    burst = [r.tokens for r in _run(4, prompts)]
    assert burst == solo


def test_burst_eos_mid_burst():
    prompts = [jnp.asarray([[5, 6, 7]])]
    ref = _run(1, prompts, max_new=10)[0].tokens
    eos = ref[2]  # force eos on the 3rd generated token
    solo = _run(1, prompts, max_new=10, eos_id=eos)[0].tokens
    burst = _run(4, prompts, max_new=10, eos_id=eos)[0].tokens
    assert burst == solo
    assert burst[-1] == eos and len(burst) == 3


def test_burst_respects_max_new_tokens():
    prompts = [jnp.asarray([[1, 2]])]
    out = _run(5, prompts, max_new=7)[0].tokens
    assert len(out) == 7
