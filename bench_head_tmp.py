import sys, time, json
import numpy as np
import jax, jax.numpy as jnp
from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.serve.decode import decode_loop, prefill
from ternary_vllm_tpu.quant.quantize import (
    fuse_packed_decoder_params, quantize_linear_int8, quantize_linear_int4)

mode = sys.argv[1]
cfg = phi.MOONDREAM_PHI_CONFIG
vocab = 128 if mode == "tinyhead" else cfg.vocab_size
if mode == "tinyhead":
    cfg = phi.PhiConfig(**{**cfg.__dict__, "vocab_size": 128})
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
hl = {"w": (jax.random.normal(keys[-1], (d, vocab)) * 0.02).astype(jnp.bfloat16),
      "b": jnp.zeros((vocab,), jnp.bfloat16)}
hl = quantize_linear_int4(hl) if mode == "int4" else quantize_linear_int8(hl)
params = {"wte": (jax.random.normal(keys[-2], (vocab, d)) * 0.02).astype(jnp.bfloat16),
          "layers": layers,
          "lm_head": {"ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
                      "linear": hl}}
spec = phi.LinearSpec(kind="packed", mode="ternary", clip_val=100.0, a8=True)
specs = tuple({n: spec for n in phi.QUANT_LINEARS} for _ in range(cfg.num_hidden_layers))
params, specs = fuse_packed_decoder_params(params, specs)
specs = phi.freeze_specs(specs)
if mode == "noattn":
    phi.USE_FUSED_DECODE_ATTENTION = False
    phi._DEBUG_SKIP_CACHE_WRITE = True
jax.block_until_ready(params)
emb = (jax.random.normal(jax.random.PRNGKey(1), (1, 64, d)) * 0.1).astype(jnp.bfloat16)
def run():
    cache = phi.init_cache(cfg, 1, 1024, jnp.bfloat16)
    jax.block_until_ready(cache)
    logits, cache = prefill(params, cfg, specs, cache, emb)
    first = jnp.argmax(logits[:, 63], axis=-1).astype(jnp.int32)
    first.block_until_ready()
    t0 = time.perf_counter()
    tokens, n, cache = decode_loop(params, cfg, specs, cache, first, jnp.int32(64),
                                   max_steps=128, eos_id=-1)
    host = np.asarray(tokens)
    return host, time.perf_counter() - t0
run()
best = min(run()[1] for _ in range(3))
print(json.dumps({"mode": mode, "tps": round(128/best, 1), "us_per_step": round(best/128*1e6, 1)}))
