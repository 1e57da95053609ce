"""Serve CLI — parity with the reference's ``test_tflite.py`` decode harness
(load frozen artifact, run autoregressive decode, print tokens/sec,
reference ``test_tflite.py:131-234``), plus continuous batching.

    python -m ternary_vllm_tpu.cli.serve --artifact artifacts/phi-q2 \
        --prompt-len 64 --max-new-tokens 128 --requests 4
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.utils.scripting import get_var


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--requests", type=int, default=1)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--eos-id", type=int, default=-1)
    p.add_argument("--burst", type=int, default=8,
                   help="fused decode steps per engine scheduling point")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel shards (>=2 serves over a device "
                        "mesh: packed weights + KV cache sharded over ICI)")
    p.add_argument("--expected-len", type=int, default=None,
                   help="typical live length (prompt+generation) the auto "
                        "cache policies should key on instead of capacity")
    p.add_argument("--cache-dtype", default="auto", choices=["auto", "bf16", "int8"],
                   help="KV cache dtype; auto = int8 when --max-len >= 2048 "
                        "(int8 wins past ~1024 live tokens), else bf16")
    p.add_argument("--speculative", type=int, default=0,
                   help="n-gram speculation window k (greedy only; 0 = off)")
    p.add_argument("--pool", default="",
                   help="mixed-capacity EnginePool: 'SHORT_LEN,LONG_LEN"
                        "[,SHORT_SLOTS,LONG_SLOTS]' (e.g. 2048,8448,7,1) — "
                        "short requests stop paying long-capacity KV "
                        "(serve/pool.py); requests route by prompt + "
                        "max-new-tokens; every other engine flag applies")
    p.add_argument("--long-prompt", action="store_true",
                   help="long-context mesh mode (requires --tp >= 2): "
                        "sequence-sharded ring prefill over the mesh feeds "
                        "the decode cache, then head-sharded TP decode. "
                        "Single-chip long prompts need no flag — the engine "
                        "chunk-prefills past its largest bucket. prompt-len "
                        "is rounded up to a multiple of tp (ring shards).")
    args = p.parse_args(argv)
    for name in vars(args):
        setattr(args, name, get_var(name, args))
    return args


def _serve_long_prompt(args, params, config, specs, rng):
    """Mesh long-context serving: sequence-sharded ring prefill
    (``parallel/sp_prefill.py``) feeds a fixed-capacity decode cache, then
    head-sharded TP decode continues over the same mesh — activation memory
    per device is O(T/tp) during prefill, so prompts far beyond one chip's
    HBM (and far beyond the reference's 2048 ceiling, ``layers.py:393``)
    prefill exactly."""
    from ternary_vllm_tpu.models import phi_tp
    from ternary_vllm_tpu.parallel.mesh import make_mesh
    from ternary_vllm_tpu.parallel.sp_prefill import sp_prefill_to_cache

    if args.tp < 2:
        raise SystemExit(
            "--long-prompt is the mesh path: needs --tp >= 2 (single-chip "
            "long prompts need no flag — the engine chunk-prefills past its "
            "largest bucket)"
        )
    if len(jax.devices()) < args.tp:
        raise SystemExit(
            f"--tp {args.tp} needs {args.tp} devices, have {len(jax.devices())}"
        )
    mesh = make_mesh(dp=1, tp=args.tp, devices=jax.devices()[: args.tp],
                     axis_names=("data", "model"))
    # checkpoint restore commits params to one device; replicate over the mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = jax.device_put(params, NamedSharding(mesh, P()))

    t = -(-args.prompt_len // args.tp) * args.tp  # ring shards T evenly
    if t + args.max_new_tokens > args.max_len:
        raise SystemExit(
            f"prompt ({t}) + max-new-tokens ({args.max_new_tokens}) exceeds "
            f"--max-len {args.max_len}"
        )
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, t)))
    emb = phi.embed_tokens(params, ids)

    t0 = time.perf_counter()
    last, cache, _ = sp_prefill_to_cache(
        params, config, specs, emb, mesh, max_len=args.max_len
    )
    first = int(jnp.argmax(last[0]))
    t1 = time.perf_counter()

    tp_params = phi_tp.shard_tp_params(
        phi_tp.tp_relayout_packed_params(params, config, args.tp), mesh
    )
    tp_cache = phi_tp.shard_tp_cache(cache, mesh)
    step = phi_tp.make_tp_decode_step(config, mesh)
    toks = [first]
    t2 = time.perf_counter()
    for i in range(args.max_new_tokens - 1):
        e = phi.embed_tokens(tp_params, jnp.asarray([[toks[-1]]]))
        logits, tp_cache = step(tp_params, tp_cache, e, jnp.int32(t + i))
        toks.append(int(phi_tp.tp_greedy_token(logits[:, -1], mesh)[0]))
        if toks[-1] == args.eos_id:
            break
    t3 = time.perf_counter()
    n = len(toks)
    print("tokens:", toks[:32])
    print(f"ring prefill T={t} over tp{args.tp}: {t1 - t0:.2f}s; "
          f"{n} tokens decoded at {max(n - 1, 1) / max(t3 - t2, 1e-9):.1f} t/s "
          f"(per-token dispatch)")


def main(argv=None):
    args = parse_args(argv)
    from ternary_vllm_tpu.convert.export import load_checkpoint

    params, config, specs = load_checkpoint(args.artifact)
    rng = np.random.default_rng(0)

    if args.long_prompt:
        return _serve_long_prompt(args, params, config, specs, rng)

    mesh = None
    if args.tp > 1:
        from ternary_vllm_tpu.models import phi_tp
        from ternary_vllm_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < args.tp:
            raise SystemExit(
                f"--tp {args.tp} needs {args.tp} devices, have {len(jax.devices())}"
            )
        mesh = make_mesh(dp=1, tp=args.tp, devices=jax.devices()[: args.tp],
                         axis_names=("data", "model"))
        params = phi_tp.shard_tp_params(
            phi_tp.tp_relayout_packed_params(params, config, args.tp), mesh
        )
        specs = None

    if args.pool:
        if mesh is not None:
            raise SystemExit("--pool is single-chip (no --tp)")
        from ternary_vllm_tpu.serve.pool import EnginePool

        parts = [int(x) for x in args.pool.split(",")]
        short_len, long_len = parts[0], parts[1]
        short_slots = parts[2] if len(parts) > 2 else 7
        long_slots = parts[3] if len(parts) > 3 else 1
        pool = EnginePool(
            params, config, specs, short_len=short_len, long_len=long_len,
            short_slots=short_slots, long_slots=long_slots,
            temperature=args.temperature, burst=args.burst,
            cache_dtype=args.cache_dtype, speculative=args.speculative,
        )
        pooled = (phi.cache_bytes(config, short_slots, pool.short.max_len, pool.short.cache_dtype)
                  + phi.cache_bytes(config, long_slots, pool.long.max_len, pool.long.cache_dtype))
        uniform = phi.cache_bytes(config, short_slots + long_slots,
                                  pool.long.max_len, pool.long.cache_dtype)
        print(f"pool KV: {pooled / (1 << 30):.2f} GiB "
              f"(uniform long-capacity would be {uniform / (1 << 30):.2f} GiB)")
        routed = {"short": 0, "long": 0}
        for _ in range(args.requests):
            ids = rng.integers(0, config.vocab_size, (1, args.prompt_len))
            name, _rid = pool.add_request(
                prompt_ids=ids, max_new_tokens=args.max_new_tokens,
                eos_id=args.eos_id,
            )
            routed[name] += 1
        t0 = time.perf_counter()
        done = pool.run()
        dt = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in done)
        print(f"{len(done)} requests (short={routed['short']} long={routed['long']}), "
              f"{total} tokens in {dt:.2f}s -> {total/dt:.1f} t/s aggregate")
        return

    if args.requests <= 1 and mesh is None:
        from ternary_vllm_tpu.serve.decode import Decoder

        dec = Decoder(params, config, specs, max_len=args.max_len)
        ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, args.prompt_len)))
        emb = phi.embed_tokens(params, ids)
        # First call is warmup: it pays jit compilation, so its timing is
        # meaningless.  The second call's timing is what we report.
        dec.generate(emb, max_new_tokens=args.max_new_tokens, eos_id=args.eos_id)
        tokens, n, timing = dec.generate(emb, max_new_tokens=args.max_new_tokens, eos_id=args.eos_id)
        print("tokens:", np.asarray(tokens)[0][:32].tolist())
        print(f"prefill {timing['prefill_s']*1e3:.1f}ms; "
              f"{timing['tokens']} tokens at {timing['tokens_per_s']:.1f} t/s")
    else:
        from ternary_vllm_tpu.serve.engine import Engine, resolve_cache_dtype

        # KV sizing: the engine allocates max_batch x max_len up front —
        # per-slot bytes = 2 * L * KVH * hd * max_len * itemsize (+ int8
        # scales); warn when the uniform allocation is large enough that a
        # mixed-capacity EnginePool (serve/pool.py) would pay for itself
        kv_total = phi.cache_bytes(
            config, args.max_batch, args.max_len,
            resolve_cache_dtype(args.cache_dtype, args.max_len, config.head_dim),
        )
        print(f"KV cache: {args.max_batch} slots x {args.max_len} capacity "
              f"= {kv_total / (1 << 30):.2f} GiB")
        if kv_total > (2 << 30) and args.max_batch > 1:
            print("  note: every slot pays full capacity; for mixed "
                  "short/long traffic EnginePool allocates per-class "
                  "capacities (ternary_vllm_tpu.serve.EnginePool)")
        eng = Engine(params, config, specs, max_batch=args.max_batch,
                     max_len=args.max_len, temperature=args.temperature,
                     burst=args.burst, cache_dtype=args.cache_dtype, mesh=mesh,
                     speculative=args.speculative,
                     expected_len=args.expected_len)
        for _ in range(args.requests):
            ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, args.prompt_len)))
            eng.add_request(phi.embed_tokens(params, ids),
                            max_new_tokens=args.max_new_tokens, eos_id=args.eos_id,
                            prompt_ids=ids)
        t0 = time.perf_counter()
        done = eng.run()
        dt = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in done)
        print(f"{len(done)} requests, {total} tokens in {dt:.2f}s "
              f"-> {total/dt:.1f} t/s aggregate")


if __name__ == "__main__":
    main()
