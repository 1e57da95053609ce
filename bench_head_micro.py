import time, json
import numpy as np
import jax, jax.numpy as jnp
from ternary_vllm_tpu.ops.ternary_matmul import int8_matmul, int4_matmul
from ternary_vllm_tpu.quant.quantize import quantize_linear_int8, quantize_linear_int4

d, v = 2048, 51200
key = jax.random.PRNGKey(0)
hl = {"w": (jax.random.normal(key, (d, v)) * 0.02).astype(jnp.bfloat16),
      "b": jnp.zeros((v,), jnp.bfloat16)}
h8 = quantize_linear_int8(hl)
h4 = quantize_linear_int4(hl)
x = (jax.random.normal(jax.random.PRNGKey(1), (1, d)) * 0.1).astype(jnp.bfloat16)
lns = jnp.ones((d,), jnp.bfloat16); lnb = jnp.zeros((d,), jnp.bfloat16)

def loop(fn, iters=200):
    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c)
            # feed a scalar back so iterations serialize
            return c + (y[0, :1] * 0).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    run(x).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6

t8 = loop(lambda c: int8_matmul(c, h8["w_q"], h8["scale"], h8["b"], ln=(lns, lnb)))
t4 = loop(lambda c: int4_matmul(c, h4["w_q4p"], h4["scale"], h4["b"], ln=(lns, lnb)))
print(json.dumps({"int8_us": round(t8,1), "int4_us": round(t4,1),
                  "int8_gbps": round(d*v/1e9/(t8*1e-6),1),
                  "int4_gbps": round(d*v/2/1e9/(t4*1e-6),1)}))
