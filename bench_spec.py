#!/usr/bin/env python
"""Speculative-decoding benchmark (VERDICT r2 weak 5: the in-engine n-gram
speculation had correctness tests but no recorded perf).

Flagship engine, batch 1, greedy.  Three regimes per k:

* ``spec`` — history seeded with the prompt ids; with a random-init model
  greedy decode settles into a cycle, which n-gram lookup then predicts —
  the repetitive-text BEST case.
* ``spec-miss`` — the bench replaces ``ngram_propose`` with a constant
  never-emitted token, so every proposal is rejected: the WORST case,
  paying the k+1-token verify forward every step for one token.
* ``plain`` — k = 0 baseline (same engine, burst decode).

Reports tokens/s and the measured acceptance rate (accepted proposals per
verify forward, 0..k, from ``Engine.stats``).

Usage: python bench_spec.py            # all regimes, short context
       python bench_spec.py --long       # 8k-prompt T-major engine rows
       python bench_spec.py --worker K SABOTAGE(0|1) [PROMPT_LEN MAX_LEN]
"""

import json
import subprocess
import sys
import time

import numpy as np

PROMPT_LEN = 64
NEW_TOKENS = 257
MAX_LEN = 1024
BURST = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def worker(k: int, sabotage: bool, prompt_len: int = PROMPT_LEN,
           max_len: int = MAX_LEN) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    if sabotage:
        # worst case: propose a token greedy decode never emits on this
        # random model (checked below), so every proposal is rejected
        import ternary_vllm_tpu.serve.speculative as spec_mod

        def never_match(history, hist_len, *, k, n):
            b = history.shape[0]
            return jnp.full((b, k), 51199, jnp.int32)

        spec_mod.ngram_propose = never_match

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.ops.packing import pack_ternary
    from ternary_vllm_tpu.quant.quantize import (
        fuse_packed_decoder_params,
        quantize_linear_int8,
    )
    from ternary_vllm_tpu.serve.engine import Engine

    cfg = phi.MOONDREAM_PHI_CONFIG
    d, f = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.num_hidden_layers + 2)

    def mk(key, kdim, ndim):
        return {
            "packed": pack_ternary(jax.random.normal(key, (kdim, ndim))),
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
    head = quantize_linear_int8(
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
            "linear": head,
        },
    }
    spec = phi.LinearSpec(kind="packed", mode="ternary", clip_val=100.0, a8=True)
    specs = tuple(
        {n: spec for n in phi.QUANT_LINEARS} for _ in range(cfg.num_hidden_layers)
    )
    params, specs = fuse_packed_decoder_params(params, specs)
    jax.block_until_ready(params)
    log(f"[worker k={k} sabotage={sabotage}] params built")

    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, prompt_len)))
    long_ctx = prompt_len > 1024
    # long mode: ids admission (chunked) + the engine's auto cache policies
    # (int8 + T-major at this capacity — the round-5 T-major verify kernels
    # keep speculation available there); short mode unchanged from round 3
    emb = None if long_ctx else phi.embed_tokens(params, ids)
    cache_dtype = "auto" if long_ctx else "bf16"

    def run():
        eng = Engine(params, cfg, specs, max_batch=1, max_len=max_len,
                     burst=BURST, cache_dtype=cache_dtype, speculative=k)
        if long_ctx:
            eng.add_request(prompt_ids=np.asarray(ids),
                            max_new_tokens=NEW_TOKENS)
        else:
            eng.add_request(emb, max_new_tokens=NEW_TOKENS, prompt_ids=ids)
        t0 = time.perf_counter()
        eng.run()
        dt = time.perf_counter() - t0
        toks = len(eng.completed[-1].tokens)
        verify = eng.stats["spec_verify_steps"]
        acc = eng.stats["spec_accepted"] / verify if verify else 0.0
        return toks / dt, toks, acc

    run()
    log("[worker] compiled")
    best = max(run() for _ in range(3))
    tps, toks, acc = best
    print(json.dumps({
        "k": k, "sabotage": bool(sabotage), "tps": round(tps, 1),
        "accept_per_verify": round(acc, 2), "prompt_len": prompt_len,
        "max_len": max_len,
    }), flush=True)


def measure(k, sabotage, attempts=4, timeout=560, prompt_len=None, max_len=None):
    extra = (
        [str(prompt_len), str(max_len)] if prompt_len is not None else []
    )
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", str(k), str(int(sabotage))]
                + extra,
                capture_output=True, text=True, timeout=timeout,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
            log(f"[measure k={k}] attempt {i}: rc={proc.returncode}; "
                f"stderr: {proc.stderr.strip().splitlines()[-4:]}")
        except subprocess.TimeoutExpired:
            log(f"[measure k={k}] attempt {i}: timeout, retrying")
    raise RuntimeError(f"failed: k={k} sabotage={sabotage}")


def median3(k, sabotage, **kw):
    """Median of 3 subprocess runs + spread (round-4 VERDICT weak #5: the
    adaptive-spec claims rode single runs inside a ±10-20% transport band;
    bench.py's discipline applied here)."""
    recs = sorted((measure(k, sabotage, **kw) for _ in range(3)), key=lambda r: r["tps"])
    med = dict(recs[1])
    med["runs"] = [r["tps"] for r in recs]
    med["spread_pct"] = round(
        100.0 * (recs[-1]["tps"] - recs[0]["tps"]) / max(med["tps"], 1e-9), 1
    )
    return med


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), bool(int(sys.argv[3])),
               *(int(a) for a in sys.argv[4:6]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--long":
        # 8k prompt on the auto (int8 + T-major) engine: round-4 VERDICT
        # weak #4 — the slowest decode regime is the one speculation helps
        # most, and the round-5 T-major verify kernels keep it available
        kw = dict(prompt_len=8192, max_len=8448, timeout=900)
        print(json.dumps(median3(0, False, **kw)), flush=True)
        print(json.dumps(median3(4, False, **kw)), flush=True)  # repetitive
        print(json.dumps(median3(4, True, **kw)), flush=True)   # always-miss
        return
    # the headline rows (plain, k=4 best/worst) get median-of-3 + spread;
    # k=8 is a single-run reference (k=4 dominates it in every round)
    print(json.dumps(median3(0, False)), flush=True)
    print(json.dumps(median3(4, False)), flush=True)   # cyclic best case
    print(json.dumps(median3(4, True)), flush=True)    # always-miss
    for k in (8,):
        print(json.dumps(measure(k, False)), flush=True)
        print(json.dumps(measure(k, True)), flush=True)


if __name__ == "__main__":
    main()
