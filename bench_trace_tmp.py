import time, json, glob, gzip, collections, sys
import numpy as np
import jax, jax.numpy as jnp
from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.serve.decode import decode_loop, prefill
from ternary_vllm_tpu.quant.quantize import fuse_packed_decoder_params, quantize_linear_int8, quantize_linear_int4
import sys
HEAD = sys.argv[1] if len(sys.argv) > 1 else 'int8'

cfg = phi.MOONDREAM_PHI_CONFIG
d, f = cfg.hidden_size, cfg.intermediate_size
key = jax.random.PRNGKey(0)
def rp(k, kd, nd):
    w = jax.random.normal(k, (kd, nd))
    return {"packed": pack_ternary(w), "scale": jnp.full((nd,), 0.02, jnp.float32),
            "b": jnp.zeros((nd,), jnp.bfloat16)}
keys = jax.random.split(key, cfg.num_hidden_layers + 2)
layers = []
for i in range(cfg.num_hidden_layers):
    ks = jax.random.split(keys[i], 4)
    layers.append({"ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
                   "wqkv": rp(ks[0], d, 3*d), "out_proj": rp(ks[1], d, d),
                   "fc1": rp(ks[2], d, f), "fc2": rp(ks[3], f, d)})
qfn = quantize_linear_int8 if HEAD == 'int8' else quantize_linear_int4
hl = qfn({"w": (jax.random.normal(keys[-1], (d, cfg.vocab_size)) * 0.02).astype(jnp.bfloat16),
      "b": jnp.zeros((cfg.vocab_size,), jnp.bfloat16)})
params = {"wte": (jax.random.normal(keys[-2], (cfg.vocab_size, d)) * 0.02).astype(jnp.bfloat16),
          "layers": layers,
          "lm_head": {"ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
                      "linear": hl}}
spec = phi.LinearSpec(kind="packed", mode="ternary", clip_val=100.0, a8=True)
specs = tuple({n: spec for n in phi.QUANT_LINEARS} for _ in range(cfg.num_hidden_layers))
params, specs = fuse_packed_decoder_params(params, specs)
specs = phi.freeze_specs(specs)
jax.block_until_ready(params)
emb = (jax.random.normal(jax.random.PRNGKey(1), (1, 64, d)) * 0.1).astype(jnp.bfloat16)
cache = phi.init_cache(cfg, 1, 1024, jnp.bfloat16)
logits, cache = prefill(params, cfg, specs, cache, emb)
first = jnp.argmax(logits[:, 63], axis=-1).astype(jnp.int32)
# compile
tokens, n, cache2 = decode_loop(params, cfg, specs, cache, first, jnp.int32(64), max_steps=128, eos_id=-1)
np.asarray(tokens)
# trace a short decode
cache = phi.init_cache(cfg, 1, 1024, jnp.bfloat16)
logits, cache = prefill(params, cfg, specs, cache, emb)
first = jnp.argmax(logits[:, 63], axis=-1).astype(jnp.int32)
first.block_until_ready()
with jax.profiler.trace("/tmp/dtrace-" + HEAD):
    tokens, n, cache = decode_loop(params, cfg, specs, cache, first, jnp.int32(64), max_steps=32, eos_id=-1)
    np.asarray(tokens)
print("trace done")
