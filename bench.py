#!/usr/bin/env python
"""Benchmark: flagship ternary Phi decode throughput vs BF16 dense baseline.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "tokens/s", "vs_baseline": N}

- metric/value: tokens/sec of fused greedy decode on the packed-ternary
  moondream-size Phi decoder (24 layers, 2048 hidden, batch 1) on one chip.
- vs_baseline: ratio vs the same decoder with dense BF16 weights on the same
  chip (the BASELINE.md north star asks for >=3x).

Robustness: this environment's remote TPU transport occasionally stalls on
host<->device transfers, so each measurement runs in a fresh subprocess with a
timeout and up to 3 attempts (``--worker`` mode is the measurement body).
Diagnostics go to stderr.
"""

import faulthandler
import json
import subprocess
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(560, exit=False)

PROMPT_LEN = 64
STEPS = 128
MAX_LEN = 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def worker(kind: str, batch: int) -> None:
    """Measure decode tokens/s for one weight kind; print one JSON line."""
    import jax
    import jax.numpy as jnp

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.ops.packing import pack_ternary
    from ternary_vllm_tpu.serve.decode import decode_loop, prefill

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

    def rand_dense_linear(k, kdim, ndim):
        return {
            "w": (jax.random.normal(k, (kdim, ndim)) * 0.02).astype(jnp.bfloat16),
            "b": jnp.zeros((ndim,), jnp.bfloat16),
        }

    mk = rand_packed_linear if kind == "packed" else rand_dense_linear
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
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
    head_linear = rand_dense_linear(keys[-1], d, cfg.vocab_size)
    if kind == "packed":
        # flagship quantizes the lm_head: the bf16 vocab projection otherwise
        # dominates the decode step's fixed cost.  Default is w8a8 (int8) —
        # measured faster than the planar-int4 head at decode (the int4
        # unpack is VPU-bound, not HBM-bound; see DESIGN.md §6).  HEAD_FMT=q4
        # selects the w4a8 head (numerically gated on a tiny random model by
        # tests/test_w2a8.py::test_compare_quantization_q4_head_gate; a
        # real-checkpoint perplexity gate via cli/parity.py is still needed
        # before using q4 in production).
        import os

        head_fmt = os.environ.get("HEAD_FMT", "q8")
        if head_fmt not in ("q8", "q4"):
            raise SystemExit(f"HEAD_FMT must be 'q8' or 'q4', got {head_fmt!r}")
        if head_fmt == "q4":
            from ternary_vllm_tpu.quant.quantize import quantize_linear_int4

            head_linear = quantize_linear_int4(head_linear)
        else:
            from ternary_vllm_tpu.quant.quantize import quantize_linear_int8

            head_linear = quantize_linear_int8(head_linear)
    params = {
        "wte": (jax.random.normal(keys[-2], (cfg.vocab_size, d)) * 0.02).astype(jnp.bfloat16),
        "layers": layers,
        "lm_head": {
            "ln": {"scale": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
            "linear": head_linear,
        },
    }
    jax.block_until_ready(params)
    log(f"[worker {kind}] params built")

    if kind == "packed":
        # a8: int8-activation (w2a8) kernels with in-kernel quantization,
        # fused [Wqkv|fc1] in_proj + dual out_proj/fc2 (2 kernels/layer)
        from ternary_vllm_tpu.quant.quantize import fuse_packed_decoder_params

        spec = phi.LinearSpec(kind="packed", mode="ternary", clip_val=100.0, a8=True)
        specs = tuple(
            {n: spec for n in phi.QUANT_LINEARS} for _ in range(cfg.num_hidden_layers)
        )
        params, specs = fuse_packed_decoder_params(params, specs)
        specs = phi.freeze_specs(specs)
    else:
        specs = phi.freeze_specs(phi.layer_specs(cfg))

    emb = (jax.random.normal(jax.random.PRNGKey(1), (batch, PROMPT_LEN, d)) * 0.1).astype(jnp.bfloat16)

    def run():
        cache = phi.init_cache(cfg, batch, MAX_LEN, jnp.bfloat16)
        jax.block_until_ready(cache)
        logits, cache = prefill(params, cfg, specs, cache, emb)
        first = jnp.argmax(logits[:, PROMPT_LEN - 1], axis=-1).astype(jnp.int32)
        first.block_until_ready()
        t0 = time.perf_counter()
        tokens, n, cache = decode_loop(
            params, cfg, specs, cache, first, jnp.int32(PROMPT_LEN),
            max_steps=STEPS, eos_id=-1,
        )
        # a real D2H fetch, not just block_until_ready: on this transport
        # readiness can be reported before remote execution finishes
        host = np.asarray(tokens)
        dt = time.perf_counter() - t0
        return host, dt

    toks_a, _ = run()  # compile
    log(f"[worker {kind}] compiled; tokens[:4]={toks_a[:, :4].tolist()}")
    best = min(run()[1] for _ in range(3))
    tps = STEPS * batch / best
    log(f"[worker {kind}] {STEPS} steps x {batch} in {best:.3f}s -> {tps:.1f} t/s")
    print(json.dumps({"kind": kind, "tps": tps}), flush=True)


def measure(kind: str, batch: int, attempts: int = 5, timeout: int = 280) -> float:
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", kind, str(batch)],
                capture_output=True, text=True, timeout=timeout,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                    if rec.get("kind") == kind:
                        return rec["tps"]
                except (json.JSONDecodeError, TypeError):
                    continue
            log(f"[measure {kind}] attempt {i}: no result (rc={proc.returncode}); "
                f"stderr tail: {proc.stderr.strip().splitlines()[-3:]}")
        except subprocess.TimeoutExpired:
            log(f"[measure {kind}] attempt {i}: timed out after {timeout}s (transport stall), retrying")
    raise RuntimeError(f"benchmark worker for {kind!r} failed {attempts} times")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]))
        return
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    # median of 3 independent subprocess runs (each itself best-of-3 in-loop):
    # round 1-3 headline drift (1017 -> 1032 -> 1005 t/s) was within the
    # transport's run-to-run noise, but a single-run headline cannot show
    # that — record the median and the spread so drift > noise is a real
    # regression signal (round-3 VERDICT weak #3)
    packed_runs = sorted(measure("packed", batch) for _ in range(3))
    dense_runs = sorted(measure("dense", batch) for _ in range(3))
    packed_tps, dense_tps = packed_runs[1], dense_runs[1]
    spread_pct = 100.0 * (packed_runs[-1] - packed_runs[0]) / packed_tps
    log(f"[main] packed runs {['%.1f' % r for r in packed_runs]} "
        f"(spread {spread_pct:.1f}%), dense runs {['%.1f' % r for r in dense_runs]}")
    print(
        json.dumps(
            {
                "metric": "ternary_phi24_decode_tokens_per_s_per_chip",
                "value": round(packed_tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(packed_tps / dense_tps, 3),
                "runs": [round(r, 1) for r in packed_runs],
                "spread_pct": round(spread_pct, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
