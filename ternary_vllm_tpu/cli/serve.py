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
    p.add_argument("--cache-dtype", default="auto", choices=["auto", "bf16", "int8"],
                   help="KV cache dtype; auto = int8 when --max-len >= 2048 "
                        "(int8 wins past ~1024 live tokens), else bf16")
    p.add_argument("--speculative", type=int, default=0,
                   help="n-gram speculation window k (greedy only; 0 = off)")
    args = p.parse_args(argv)
    for name in vars(args):
        setattr(args, name, get_var(name, args))
    return args


def main(argv=None):
    args = parse_args(argv)
    from ternary_vllm_tpu.convert.export import load_checkpoint

    params, config, specs = load_checkpoint(args.artifact)
    rng = np.random.default_rng(0)

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
        from ternary_vllm_tpu.serve.engine import Engine

        eng = Engine(params, config, specs, max_batch=args.max_batch,
                     max_len=args.max_len, temperature=args.temperature,
                     burst=args.burst, cache_dtype=args.cache_dtype, mesh=mesh,
                     speculative=args.speculative)
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
