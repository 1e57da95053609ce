import time, json, sys
import numpy as np
import jax, jax.numpy as jnp
from ternary_vllm_tpu.ops.ternary_matmul import _w4a8_matmul_pallas
from ternary_vllm_tpu.quant.quantize import quantize_linear_int4

d, v = 2048, 51200
key = jax.random.PRNGKey(0)
hl = {"w": (jax.random.normal(key, (d, v)) * 0.02).astype(jnp.bfloat16),
      "b": jnp.zeros((v,), jnp.bfloat16)}
h4 = quantize_linear_int4(hl)
packed = h4["w_q4p"]; scale = h4["scale"].reshape(1, v).astype(jnp.float32)
bias = jnp.zeros((1, v), jnp.float32)
x = (jax.random.normal(jax.random.PRNGKey(1), (1, d)) * 0.1).astype(jnp.bfloat16)

def loop(bs, bn, iters=200):
    @jax.jit
    def run(x):
        def body(c, _):
            y = _w4a8_matmul_pallas(c, packed, scale, bias, out_dtype=jnp.bfloat16,
                                    bm=1, bn=bn, bs=bs)
            return c + (y[:, :1] * 0).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    run(x).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6

configs = [(int(a), int(b)) for a, b in (c.split(",") for c in sys.argv[1:])] or [
    (256, 12800), (512, 6400), (128, 12800)]
for bs, bn in configs:
    t = loop(bs, bn)
    print(json.dumps({"bs": bs, "bn": bn, "us": round(t, 1),
                      "gbps": round(d * v / 2 / 1e9 / (t * 1e-6), 1)}),
          file=sys.stderr, flush=True)
