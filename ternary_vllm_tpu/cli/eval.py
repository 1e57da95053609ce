"""Eval CLI: FP-vs-quantized loss/perplexity comparison (the BASELINE
accuracy-gate, ``BASELINE.md``: <=1% drop at same bit-width).

    python -m ternary_vllm_tpu.cli.eval --tiny --quantization ternary
    python -m ternary_vllm_tpu.cli.eval --checkpoint model.safetensors \
        --tokens tokens.npy --gate 0.01
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.eval.perplexity import compare_quantization
from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import QuantConfig
from ternary_vllm_tpu.utils.scripting import get_var


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tokens", default=None, help=".npy int array (N, T) of eval tokens")
    p.add_argument("--text-file", default=None,
                   help="corpus file for the gate (.txt, or .npy/.npz token "
                        "stream); cut into --seq-len windows — supply >=50k "
                        "tokens for a trustworthy gate")
    p.add_argument("--tokenizer", default=None,
                   help="local HF tokenizer dir for --text-file (byte-level "
                        "fallback without it: smoke-quality only)")
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=None,
                   help="truncate the corpus stream (default: use all)")
    p.add_argument("--quantization", default="ternary",
                   choices=["ternary", "binary", "binary01", "smoothBinary"])
    p.add_argument("--start-skip", type=int, default=0)
    p.add_argument("--last-skip", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--gate", type=float, default=None,
                   help="fail (exit 1) if relative ppl increase exceeds this")
    p.add_argument("--a8", action="store_true",
                   help="evaluate the int8-activation (w2a8) kernel path")
    p.add_argument("--int8-head", action="store_true",
                   help="evaluate with the lm_head quantized to w8a8")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)
    for name in vars(args):
        setattr(args, name, get_var(name, args))

    config = phi.TINY_PHI_CONFIG if args.tiny else phi.MOONDREAM_PHI_CONFIG
    if args.checkpoint:
        from ternary_vllm_tpu.convert.torch_import import load_safetensors_params

        params = load_safetensors_params(args.checkpoint, config)
    else:
        print("no --checkpoint: random init (pipeline validation mode)")
        params = phi.init_phi_params(jax.random.PRNGKey(0), config)

    if args.text_file:
        from ternary_vllm_tpu.eval.perplexity import corpus_token_batches

        tok = None
        if args.tokenizer:
            import transformers

            tok = transformers.AutoTokenizer.from_pretrained(
                args.tokenizer, local_files_only=True
            )
        batches = corpus_token_batches(
            args.text_file, tokenizer=tok, vocab_size=config.vocab_size,
            seq_len=args.seq_len, batch_size=args.batch_size,
            max_tokens=args.max_tokens,
        )
        n_tok = sum(int(b["input_ids"].size) for b in batches)
        print(f"corpus: {n_tok} tokens in {len(batches)} batches "
              f"(seq_len={args.seq_len})")
    else:
        if args.tokens:
            ids = np.load(args.tokens)
        else:
            ids = np.random.default_rng(0).integers(0, config.vocab_size, (8, 32))
        batches = [
            {
                "input_ids": jnp.asarray(ids[i : i + args.batch_size]),
                "labels": jnp.asarray(ids[i : i + args.batch_size]),
            }
            for i in range(0, len(ids), args.batch_size)
        ]

    qc = QuantConfig(
        quantization=args.quantization,
        start_skip=args.start_skip,
        last_skip=args.last_skip,
    )
    rep = compare_quantization(
        params, config, batches, qc, a8=args.a8, int8_head=args.int8_head
    )
    for k, v in rep.items():
        print(f"{k:20s} {v:.6f}")
    if args.gate is not None and rep["rel_ppl_increase"] > args.gate:
        print(f"FAIL: rel ppl increase {rep['rel_ppl_increase']:.4f} > gate {args.gate}")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
