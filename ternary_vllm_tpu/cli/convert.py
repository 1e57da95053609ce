"""Convert CLI — parity with the reference's ``convert.py`` (checkpoint →
frozen packed inference artifact, reference ``convert.py:31-166``).

    python -m ternary_vllm_tpu.cli.convert --checkpoint model.safetensors \
        --variant pallas --out artifacts/moondream-q2
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    pack_decoder_params,
    quantize_decoder_params,
    size_report,
)
from ternary_vllm_tpu.utils.scripting import get_var


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="dense checkpoint -> packed artifact")
    p.add_argument("--checkpoint", default=None, help=".safetensors dense weights")
    p.add_argument("--quantization", default="ternary",
                   choices=["ternary", "binary", "binary01"])
    # the reference's kernel variants {continuous,tf,matmul,unpack} map to our
    # dispatch choices (convert.py:33): pallas = fused kernel, xla = unpack+dot
    p.add_argument("--variant", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument("--fmt", default="q2", choices=["q2", "q4"],
                   help="packed storage: q2 (2-bit, memory-optimal) or q4 (nibble int4)")
    p.add_argument("--fuse", action="store_true",
                   help="fuse each layer's 4 matmuls into 2 kernels (q2 only)")
    p.add_argument("--a8", action="store_true",
                   help="mark specs for the int8-activation (w2a8) kernel (q2 only)")
    p.add_argument("--int8-head", action="store_true",
                   help="quantize the lm_head to w8a8 int8 (same as --head q8)")
    p.add_argument("--head", default=None, choices=["q8", "q4"],
                   help="lm_head quantization: q8 (w8a8) or q4 (planar-int4 w4a8)")
    p.add_argument("--start-skip", type=int, default=0)
    p.add_argument("--last-skip", type=int, default=0)
    p.add_argument("--export-signatures", action="store_true")
    p.add_argument("--out", default="artifacts/phi-q2")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)
    for name in vars(args):
        setattr(args, name, get_var(name, args))
    return args


def main(argv=None):
    args = parse_args(argv)
    config = phi.TINY_PHI_CONFIG if args.tiny else phi.MOONDREAM_PHI_CONFIG
    if args.checkpoint:
        from ternary_vllm_tpu.convert.torch_import import load_safetensors_params

        params = load_safetensors_params(args.checkpoint, config)
    else:
        print("no --checkpoint: random init (pipeline validation mode)")
        params = phi.init_phi_params(jax.random.PRNGKey(0), config)

    qc = QuantConfig(
        quantization=args.quantization,
        start_skip=args.start_skip,
        last_skip=args.last_skip,
    )
    qat, qspecs = quantize_decoder_params(params, config, qc)
    packed, pspecs = pack_decoder_params(
        qat, qspecs, k_multiple=4 if args.tiny else 512, fmt=args.fmt, a8=args.a8
    )
    if args.fuse:
        from ternary_vllm_tpu.quant.quantize import fuse_packed_decoder_params

        packed, pspecs = fuse_packed_decoder_params(packed, pspecs)
    head_fmt = args.head or ("q8" if args.int8_head else None)
    if head_fmt == "q8":
        from ternary_vllm_tpu.quant.quantize import quantize_lm_head_int8

        packed = quantize_lm_head_int8(packed)
    elif head_fmt == "q4":
        from ternary_vllm_tpu.quant.quantize import quantize_lm_head_int4

        packed = quantize_lm_head_int4(packed)
    if args.variant != "auto":
        import dataclasses

        pspecs = tuple(
            {n: (dataclasses.replace(s, impl=args.variant) if s.kind == "packed" else s)
             for n, s in layer.items()}
            for layer in pspecs
        )
    print("size:", size_report(packed, pspecs))

    # golden parity gate (the reference prints MSE per block, conversion.py:144;
    # we assert on full logits)
    ids = jnp.asarray([[1, 2, 3, 4, 5]])
    dense_logits, _ = phi.forward_tokens(params, config, phi.layer_specs(config), ids)
    packed_logits, _ = phi.forward_tokens(packed, config, pspecs, ids)
    mse = float(jnp.mean((dense_logits - packed_logits) ** 2))
    print(f"quantized-vs-dense logits MSE: {mse:.6f} (quantization error, not a bug gate)")

    from ternary_vllm_tpu.convert.export import save_checkpoint, export_signatures, save_exported

    save_checkpoint(args.out, packed, config, pspecs)
    print("saved artifact:", args.out)
    if args.export_signatures:
        blobs = export_signatures(packed, config, pspecs)
        save_exported(args.out + "/signatures", blobs)
        print("exported AOT signatures:", list(blobs))


if __name__ == "__main__":
    main()
