#!/usr/bin/env python
"""KV-cache dtype benchmark: flagship packed-ternary decode, bf16 vs int8 KV.

For each (max_len, prompt_len) config, measures greedy decode tokens/s with
the bf16 tuple cache and the int8 4-tuple cache (lane-major scales + fused
rope/quantize/write/attention kernel).  The int8 cache halves attention HBM
traffic; the win grows with live context length.

Usage: python bench_kv.py            # run all configs (subprocess per point)
       python bench_kv.py --worker CACHE_DTYPE MAX_LEN PROMPT_LEN
Prints one JSON line per measurement.
"""

import json
import subprocess
import sys
import time

import numpy as np

STEPS = 128

CONFIGS = [(1024, 64), (2048, 1024), (2048, 1792)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def worker(cache_dtype: str, max_len: int, prompt_len: int) -> None:
    import jax
    import jax.numpy as jnp

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.ops.packing import pack_ternary
    from ternary_vllm_tpu.quant.quantize import (
        fuse_packed_decoder_params,
        quantize_linear_int8,
    )
    from ternary_vllm_tpu.serve.decode import decode_loop, prefill

    cfg = phi.MOONDREAM_PHI_CONFIG
    if max_len > cfg.max_position_embeddings:
        cfg = phi.PhiConfig(**{**cfg.__dict__, "max_position_embeddings": max_len})
    d, f = cfg.hidden_size, cfg.intermediate_size
    key = jax.random.PRNGKey(0)

    def rand_packed_linear(k, kdim, ndim):
        w = jax.random.normal(k, (kdim, ndim))
        return {
            "packed": pack_ternary(w),
            "scale": jnp.full((ndim,), 0.02, jnp.float32),
            "b": jnp.zeros((ndim,), jnp.bfloat16),
        }

    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 4)
        layers.append(
            {
                "ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
                "wqkv": rand_packed_linear(ks[0], d, 3 * d),
                "out_proj": rand_packed_linear(ks[1], d, d),
                "fc1": rand_packed_linear(ks[2], d, f),
                "fc2": rand_packed_linear(ks[3], f, d),
            }
        )
    head_linear = quantize_linear_int8(
        {
            "w": (jax.random.normal(keys[-1], (d, cfg.vocab_size)) * 0.02).astype(jnp.bfloat16),
            "b": jnp.zeros((cfg.vocab_size,), jnp.bfloat16),
        }
    )
    params = {
        "wte": (jax.random.normal(keys[-2], (cfg.vocab_size, d)) * 0.02).astype(jnp.bfloat16),
        "layers": layers,
        "lm_head": {
            "ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
            "linear": head_linear,
        },
    }
    spec = phi.LinearSpec(kind="packed", mode="ternary", clip_val=100.0, a8=True)
    specs = tuple(
        {n: spec for n in phi.QUANT_LINEARS} for _ in range(cfg.num_hidden_layers)
    )
    params, specs = fuse_packed_decoder_params(params, specs)
    specs = phi.freeze_specs(specs)
    jax.block_until_ready(params)
    log(f"[worker {cache_dtype} ml={max_len} pl={prompt_len}] params built")

    emb = (jax.random.normal(jax.random.PRNGKey(1), (1, prompt_len, d)) * 0.1).astype(jnp.bfloat16)
    cdt = "int8" if cache_dtype == "int8" else jnp.bfloat16

    # T-major under the serving auto policy (Engine/Decoder: max_len >= 2048,
    # hd < 128) — these rows now measure what the default engine serves
    from ternary_vllm_tpu.serve.decode import _transpose_cache_jit
    from ternary_vllm_tpu.serve.engine import resolve_cache_layout

    layout = resolve_cache_layout("auto", max_len, cfg.head_dim, None)

    def run():
        cache = phi.init_cache(cfg, 1, max_len, cdt)
        jax.block_until_ready(cache)
        logits, cache = prefill(params, cfg, specs, cache, emb)
        if layout == "tmajor":
            cache = _transpose_cache_jit(cache)
        first = jnp.argmax(logits[:, prompt_len - 1], axis=-1).astype(jnp.int32)
        first.block_until_ready()
        t0 = time.perf_counter()
        tokens, n, cache = decode_loop(
            params, cfg, specs, cache, first, jnp.int32(prompt_len),
            max_steps=STEPS, eos_id=-1,
        )
        host = np.asarray(tokens)
        dt = time.perf_counter() - t0
        return host, dt

    toks, _ = run()
    log(f"[worker] compiled; tokens[:4]={toks[:, :4].tolist()}")
    best = min(run()[1] for _ in range(3))
    tps = STEPS / best
    print(json.dumps({"cache": cache_dtype, "max_len": max_len,
                      "prompt_len": prompt_len, "layout": layout,
                      "tps": round(tps, 1)}), flush=True)


def measure(cache_dtype, max_len, prompt_len, attempts=4, timeout=420):
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", cache_dtype, str(max_len), str(prompt_len)],
                capture_output=True, text=True, timeout=timeout,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
            log(f"[measure] attempt {i}: rc={proc.returncode}; stderr: {proc.stderr.strip().splitlines()[-3:]}")
        except subprocess.TimeoutExpired:
            log(f"[measure] attempt {i}: timeout, retrying")
    raise RuntimeError(f"failed: {cache_dtype} {max_len} {prompt_len}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    for max_len, prompt_len in CONFIGS:
        for cd in ("bf16", "int8"):
            rec = measure(cd, max_len, prompt_len)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
