"""Engine streaming callbacks: per-token delivery order and completeness."""

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.serve.engine import Engine

CFG = phi.TINY_PHI_CONFIG


def test_on_token_streams_all_tokens():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG)
    eng = Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,))

    streamed = {}

    def cb(tok, req):
        streamed.setdefault(req.request_id, []).append(tok)

    ids = []
    for i in range(3):
        p = jnp.asarray([[i + 1, i + 2, i + 3]])
        ids.append(
            eng.add_request(phi.embed_tokens(params, p), max_new_tokens=5, on_token=cb)
        )
    done = eng.run()
    assert len(done) == 3
    for r in done:
        assert streamed[r.request_id] == r.tokens
