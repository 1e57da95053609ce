#!/usr/bin/env python
"""Prefill roofline + path A/B: packed kernels vs unpack-once-to-bf16 dense.

Round-3 VERDICT item 2: decode has a byte model and traces; prefill only ever
had wall-clock.  This bench gives TTFT (engine chunked admission, the served
metric) an MFU denominator and A/Bs the two candidate weight paths at prefill
shapes (M = chunk = 1024):

  * ``packed``  — the flagship fused w2a8 kernels (decode's winner); the ViT
    study (BENCHMARKS.md) predicts these LOSE at compute-bound shapes
    (0.58-0.81x dense).
  * ``dense``   — unpack the ternary planes once to bf16 (w = codes * scale)
    at engine build, run XLA dense matmuls on the MXU; numerics match the
    packed path up to bf16 rounding (same dequantized weights).

MFU model (per prompt token): linears 2*(4*d^2 + 2*d*f)*L + head 2*d*V on the
final chunk only; attention 2*d*T^2*L total (QK + PV, causal-halved).  Peak
bf16 on this chip (v5e) = 197 TFLOP/s.

Usage: python bench_prefill.py                    # full sweep -> JSON lines
       python bench_prefill.py --worker PATH PROMPT_LEN MAX_LEN
"""

import json
import subprocess
import sys
import time

import numpy as np

MAX_LEN = 8192 + 256
CONFIGS = [(4096, MAX_LEN), (8192, MAX_LEN)]
PEAK_BF16 = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _params():
    """Unfused packed flagship params (bench_long layout) + config/specs."""
    import jax
    import jax.numpy as jnp

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.ops.packing import pack_ternary
    from ternary_vllm_tpu.quant.quantize import quantize_linear_int8

    cfg = phi.MOONDREAM_PHI_CONFIG
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
    return cfg, params, specs


def prefill_flops(cfg, t: int) -> float:
    d, f, L, V = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.num_hidden_layers,
        cfg.vocab_size,
    )
    linears = 2.0 * (4 * d * d + 2 * d * f) * L * t
    head = 2.0 * d * V * 1024  # head runs on the FINAL admitted chunk only
    attn = 2.0 * d * t * t * L  # QK + PV, causal-halved
    return linears + head + attn


def worker(path: str, prompt_len: int, max_len: int, chunk: int = 1024) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.quant.quantize import fuse_packed_decoder_params
    from ternary_vllm_tpu.serve.engine import Engine

    if path not in ("packed", "dense"):
        raise SystemExit(f"unknown path {path}")
    cfg, params, specs = _params()
    params, specs = fuse_packed_decoder_params(params, specs)
    jax.block_until_ready(params)
    log(f"[worker {path} pl={prompt_len}] params built")

    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (1, prompt_len))

    def run():
        # prefill_path pinned: "dense" makes the engine unpack once at build
        # (decode stays packed in both rows, as in production); ids admission
        # = the production text path (device-side embedding)
        buckets = tuple(b for b in (32, 64, 128, 256, 512, 1024, 2048) if b <= chunk)
        eng = Engine(params, cfg, specs, max_batch=1, max_len=max_len,
                     cache_dtype="bf16", speculative=0, prefill_path=path,
                     buckets=buckets)
        # the dense path's one-time unpack runs async at engine build — force
        # it to finish so it doesn't serialize into the timed admission
        jax.block_until_ready(eng.prefill_params)
        np.asarray(eng.tokens)
        t0 = time.perf_counter()
        eng.add_request(prompt_ids=ids, max_new_tokens=4)
        eng._admit()
        eng.drain_admission()  # staged admission: run all chunks now
        np.asarray(eng.tokens)  # real fetch (transport can report early)
        return time.perf_counter() - t0

    run()  # compile
    log("[worker] compiled")
    prefill_s = min(run() for _ in range(3))
    fl = prefill_flops(cfg, prompt_len)
    print(json.dumps({
        "path": path, "prompt_len": prompt_len, "chunk": chunk,
        "prefill_s": round(prefill_s, 3),
        "mfu_pct": round(100.0 * fl / prefill_s / PEAK_BF16, 1),
    }), flush=True)


def trace_worker(path: str, prompt_len: int, max_len: int) -> None:
    """One warm admission under a profiler trace + per-op busy-time table."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.quant.quantize import fuse_packed_decoder_params
    from ternary_vllm_tpu.serve.engine import Engine
    from ternary_vllm_tpu.utils.profiling import trace
    from ternary_vllm_tpu.utils.trace_summary import summarize

    cfg, params, specs = _params()
    params, specs = fuse_packed_decoder_params(params, specs)
    jax.block_until_ready(params)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (1, prompt_len))

    def run():
        eng = Engine(params, cfg, specs, max_batch=1, max_len=max_len,
                     cache_dtype="bf16", speculative=0, prefill_path=path)
        t0 = time.perf_counter()
        eng.add_request(prompt_ids=ids, max_new_tokens=4)
        eng._admit()
        eng.drain_admission()
        np.asarray(eng.tokens)
        return time.perf_counter() - t0

    run()  # compile
    log(f"[trace] warm admission: {run():.3f}s")
    logdir = f"/tmp/trace-prefill-{path}"
    with trace(logdir):
        dt = run()
    log(f"[trace] traced admission: {dt:.3f}s -> {logdir}")
    print(summarize(logdir, top_n=30), flush=True)


def measure(path, prompt_len, max_len, chunk=1024, attempts=4, timeout=560):
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", path,
                 str(prompt_len), str(max_len), str(chunk)],
                capture_output=True, text=True, timeout=timeout,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
            log(f"[measure] attempt {i}: rc={proc.returncode}; "
                f"stderr: {proc.stderr.strip().splitlines()[-6:]}")
        except subprocess.TimeoutExpired:
            log(f"[measure] attempt {i}: timeout, retrying")
    raise RuntimeError(f"failed: {path} {prompt_len}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
               int(sys.argv[5]) if len(sys.argv) > 5 else 1024)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--trace":
        trace_worker(sys.argv[2], int(sys.argv[3]),
                     int(sys.argv[4]) if len(sys.argv) > 4 else MAX_LEN)
        return
    for prompt_len, max_len in CONFIGS:
        for path in ("packed", "dense"):
            print(json.dumps(measure(path, prompt_len, max_len)), flush=True)
    # admission-chunk A/B (round-5 v3 kernel enables 2048-chunks)
    for chunk in (2048,):
        for prompt_len, max_len in CONFIGS:
            rec = measure("packed", prompt_len, max_len, chunk=chunk)
            rec["chunk"] = chunk
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
