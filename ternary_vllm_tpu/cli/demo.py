"""Quick-demo CLI — parity with the reference's ``main.py`` (quantize all
Linears in place, print parameter counts and estimated sizes,
reference ``main.py:27-68``).

    python -m ternary_vllm_tpu.cli.demo --quantization binary [--tiny]
"""

from __future__ import annotations

import argparse

import jax

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import QuantConfig, quantize_decoder_params, size_report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quantization", default="binary",
                   choices=["ternary", "binary", "binary01", "smoothBinary"])
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    config = phi.TINY_PHI_CONFIG if args.tiny else phi.MOONDREAM_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), config)
    qat, specs = quantize_decoder_params(params, config, QuantConfig(quantization=args.quantization))
    rep = size_report(qat, specs)
    print(f"quantization       : {args.quantization}")
    print(f"quantized params   : {rep['quantized_params']:,}")
    print(f"other params       : {rep['other_params']:,}")
    print(f"estimated size     : {rep['total_gib']:.3f} GiB")
    print(f"fp16 size          : {rep['fp16_gib']:.3f} GiB")
    print(f"compression        : {rep['fp16_gib']/rep['total_gib']:.2f}x")


if __name__ == "__main__":
    main()
