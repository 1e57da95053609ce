#!/usr/bin/env python
"""Active-slot stall during long-prompt admission (round-4 VERDICT weak #3).

``Engine.step()`` stages long-prompt admissions: when another slot is
actively decoding, only ``adm_chunks_per_step`` prefill chunks run per
engine iteration, interleaved with the decode bursts.  This bench measures
what an ACTIVE slot experiences while an 8k prompt admits:

* ``base_iter_ms``   — median engine-iteration wall time with one short slot
  decoding (burst tokens + one host round-trip);
* ``adm_iter_ms_max``— the worst iteration while the 8k admission is in
  flight (staged: base + one 2048-token prefill chunk);
* ``drain_stall_ms`` — the same admission run to completion in one gap
  (``drain_admission``, the pre-round-5 behavior): the stall the active
  slot would have seen without interleaving.

Pass criterion (VERDICT wording: "stall <= one burst"): ``adm_iter_ms_max``
stays within one chunk-prefill of ``base_iter_ms`` and far below
``drain_stall_ms``.  Correctness half lives in
``tests/test_engine_chunked.py::test_admission_interleaves_with_decode``.

Usage: python bench_stall.py            # median of 3 subprocess runs
       python bench_stall.py --worker
"""

import json
import subprocess
import sys
import time

import numpy as np

PROMPT_SHORT = 64
PROMPT_LONG = 8192
MAX_LEN = 8448
BURST = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def worker() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench_long import _flagship
    from ternary_vllm_tpu.serve.engine import Engine

    cfg, params, specs = _flagship()
    jax.block_until_ready(params)
    log("[stall worker] params built")
    rng = np.random.default_rng(7)
    ids_a = rng.integers(0, cfg.vocab_size, (1, PROMPT_SHORT))
    ids_b = rng.integers(0, cfg.vocab_size, (1, PROMPT_LONG))

    def run():
        eng = Engine(params, cfg, specs, max_batch=2, max_len=MAX_LEN,
                     burst=BURST, speculative=0)
        eng.add_request(prompt_ids=ids_a, max_new_tokens=2000)
        eng.step()  # admit + first burst
        for _ in range(2):
            eng.step()
        # baseline iteration time (short slot decoding alone)
        base = []
        for _ in range(5):
            t0 = time.perf_counter()
            eng.step()
            base.append(time.perf_counter() - t0)
        base_ms = sorted(base)[len(base) // 2] * 1e3

        # staged 8k admission, interleaved with the active slot's decode
        a_req = eng.slots[0]
        eng.add_request(prompt_ids=ids_b, max_new_tokens=4)
        adm_iters = []
        a_tokens_per_iter = []
        while len(eng.completed) < 1:  # until the long request finishes
            n0 = len(a_req.tokens)
            t0 = time.perf_counter()
            eng.step()
            adm_iters.append(time.perf_counter() - t0)
            a_tokens_per_iter.append(len(a_req.tokens) - n0)
        return base_ms, [x * 1e3 for x in adm_iters], a_tokens_per_iter

    def run_drain():
        eng = Engine(params, cfg, specs, max_batch=2, max_len=MAX_LEN,
                     burst=BURST, speculative=0)
        eng.add_request(prompt_ids=ids_a, max_new_tokens=2000)
        for _ in range(3):
            eng.step()
        eng.add_request(prompt_ids=ids_b, max_new_tokens=4)
        t0 = time.perf_counter()
        eng._admit()
        eng.drain_admission()
        np.asarray(eng.tokens)
        return (time.perf_counter() - t0) * 1e3

    run()  # compile both programs
    run_drain()
    log("[stall worker] compiled")
    base_ms, adm_ms, a_toks = run()
    drain_ms = min(run_drain() for _ in range(3))
    # iterations where the admission was actually advancing (chunk in flight)
    print(json.dumps({
        "base_iter_ms": round(base_ms, 1),
        "adm_iter_ms_max": round(max(adm_ms), 1),
        "adm_iters_ms": [round(x, 1) for x in adm_ms],
        "active_tokens_per_adm_iter": a_toks,
        "drain_stall_ms": round(drain_ms, 1),
        "burst": BURST,
    }), flush=True)


def measure(attempts=4, timeout=560):
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker"],
                capture_output=True, text=True, timeout=timeout,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
            log(f"[measure] attempt {i}: rc={proc.returncode}; "
                f"stderr: {proc.stderr.strip().splitlines()[-4:]}")
        except subprocess.TimeoutExpired:
            log(f"[measure] attempt {i}: timeout, retrying")
    raise RuntimeError("bench_stall worker failed")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker()
        return
    recs = sorted((measure() for _ in range(3)),
                  key=lambda r: r["adm_iter_ms_max"])
    med = dict(recs[1])
    med["runs_adm_iter_ms_max"] = [r["adm_iter_ms_max"] for r in recs]
    med["spread_pct"] = round(
        100.0 * (recs[-1]["adm_iter_ms_max"] - recs[0]["adm_iter_ms_max"])
        / max(med["adm_iter_ms_max"], 1e-9), 1)
    print(json.dumps(med), flush=True)


if __name__ == "__main__":
    main()
