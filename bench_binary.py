#!/usr/bin/env python
"""Binary-variant flagship benchmark (BASELINE config 5 "ternary + binary
variants"; VERDICT r2 item 3: the only recorded binary number predated the
w2a8 kernels).

Measures greedy decode tokens/s of the flagship 24-layer decoder with
1-bit weights — ``binary`` ({-1,+1}) and ``binary01`` ({0,1}) — through the
FUSED w1a8 packed kernels (8 bit-planes, int8 MXU, in_proj + dual out2 —
round 3 extended the fusion beyond ternary) + int8 lm_head, against the
same bf16 dense baseline bench.py uses.

Usage: python bench_binary.py            # binary + binary01 + dense baseline
       python bench_binary.py --worker MODE   (binary | binary01 | dense)
"""

import json
import subprocess
import sys
import time

import numpy as np

PROMPT_LEN = 64
STEPS = 128
MAX_LEN = 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def worker(mode: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.ops.packing import pack_binary
    from ternary_vllm_tpu.quant.quantize import quantize_linear_int8
    from ternary_vllm_tpu.serve.decode import decode_loop, prefill

    cfg = phi.MOONDREAM_PHI_CONFIG
    d, f = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.num_hidden_layers + 2)

    def mk(k, kdim, ndim):
        w = jax.random.normal(k, (kdim, ndim))
        if mode == "dense":
            return {"w": (w * 0.02).astype(jnp.bfloat16),
                    "b": jnp.zeros((ndim,), jnp.bfloat16)}
        return {
            "packed": pack_binary(w, zero_one=(mode == "binary01")),
            "scale": jnp.full((ndim,), 0.02, jnp.float32),
            "b": jnp.zeros((ndim,), jnp.bfloat16),
        }

    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 4)
        layers.append(
            {
                "ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
                "wqkv": mk(ks[0], d, 3 * d),
                "out_proj": mk(ks[1], d, d),
                "fc1": mk(ks[2], d, f),
                "fc2": mk(ks[3], f, d),
            }
        )
    head = {
        "w": (jax.random.normal(keys[-1], (d, cfg.vocab_size)) * 0.02).astype(jnp.bfloat16),
        "b": jnp.zeros((cfg.vocab_size,), jnp.bfloat16),
    }
    if mode != "dense":
        head = quantize_linear_int8(head)
    params = {
        "wte": (jax.random.normal(keys[-2], (cfg.vocab_size, d)) * 0.02).astype(jnp.bfloat16),
        "layers": layers,
        "lm_head": {
            "ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
            "linear": head,
        },
    }
    if mode == "dense":
        specs = phi.layer_specs(cfg)
    else:
        from ternary_vllm_tpu.quant.quantize import fuse_packed_decoder_params

        spec = phi.LinearSpec(kind="packed", mode=mode, clip_val=100.0, a8=True)
        specs = tuple(
            {n: spec for n in phi.QUANT_LINEARS} for _ in range(cfg.num_hidden_layers)
        )
        params, specs = fuse_packed_decoder_params(params, specs)
    specs = phi.freeze_specs(specs)
    jax.block_until_ready(params)
    log(f"[worker {mode}] params built")

    emb = (jax.random.normal(jax.random.PRNGKey(1), (1, PROMPT_LEN, d)) * 0.1).astype(jnp.bfloat16)

    def run():
        cache = phi.init_cache(cfg, 1, MAX_LEN, jnp.bfloat16)
        jax.block_until_ready(cache)
        logits, cache = prefill(params, cfg, specs, cache, emb)
        first = jnp.argmax(logits[:, PROMPT_LEN - 1], axis=-1).astype(jnp.int32)
        first.block_until_ready()
        t0 = time.perf_counter()
        tokens, n, cache = decode_loop(
            params, cfg, specs, cache, first, jnp.int32(PROMPT_LEN),
            max_steps=STEPS, eos_id=-1,
        )
        host = np.asarray(tokens)
        dt = time.perf_counter() - t0
        return host, dt

    run()
    log(f"[worker {mode}] compiled")
    best = min(run()[1] for _ in range(3))
    print(json.dumps({"mode": mode, "tps": round(STEPS / best, 1)}), flush=True)


def measure(mode, attempts=4, timeout=560):
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", mode],
                capture_output=True, text=True, timeout=timeout,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
            log(f"[measure {mode}] attempt {i}: rc={proc.returncode}; "
                f"stderr: {proc.stderr.strip().splitlines()[-4:]}")
        except subprocess.TimeoutExpired:
            log(f"[measure {mode}] attempt {i}: timeout, retrying")
    raise RuntimeError(f"failed: {mode}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
        return
    dense = measure("dense")["tps"]
    for mode in ("binary", "binary01"):
        rec = measure(mode)
        rec["vs_bf16"] = round(rec["tps"] / dense, 3)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"mode": "dense", "tps": dense}), flush=True)


if __name__ == "__main__":
    main()
