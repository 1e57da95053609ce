"""VLM quick demo — the reference's ``main.py`` + ``test_tflite.py`` shape,
end to end: image -> vision tower -> projection -> spliced prompt -> ternary
decode -> token ids (+ text if a tokenizer hook is provided).

Runs with random weights if no checkpoints are given, demonstrating the full
wiring on TPU:

    python -m ternary_vllm_tpu.cli.vlm_demo --tiny --max-new-tokens 16
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi, vision, vlm
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    pack_decoder_params,
    quantize_decoder_params,
)
from ternary_vllm_tpu.serve.decode import Decoder


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None, help="path to an image (PIL-readable)")
    p.add_argument("--question-ids", default=None, help=".npy int token ids for the question")
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--quantization", default="ternary")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    if args.tiny:
        cfg = vlm.TINY_VLM_CONFIG
    else:
        cfg = vlm.VLMConfig()
    params = vlm.init_vlm_params(jax.random.PRNGKey(0), cfg)

    qat, qspecs = quantize_decoder_params(
        params["text"], cfg.text, QuantConfig(quantization=args.quantization)
    )
    packed, pspecs = pack_decoder_params(qat, qspecs, k_multiple=4 if args.tiny else 512)
    params = dict(params)
    params["text"] = packed

    # image
    if args.image:
        from ternary_vllm_tpu.data.llava import preprocess_images
        from PIL import Image

        img = jnp.asarray(preprocess_images([Image.open(args.image)], cfg.vision.image_size))
    else:
        img = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)),
            jnp.float32,
        )
    t0 = time.perf_counter()
    img_embs = vlm.encode_image(params, cfg, img)
    jax.block_until_ready(img_embs)
    print(f"image encoded: {img_embs.shape} in {time.perf_counter()-t0:.2f}s")

    if args.question_ids:
        q_ids = jnp.asarray(np.load(args.question_ids))[None, :]
    else:
        q_ids = jnp.asarray([[5, 6, 7, 8]])
    prompt = vlm.splice_prompt(params, img_embs, jnp.zeros((1, 0), jnp.int32), q_ids, bos_id=1)

    dec = Decoder(params["text"], cfg.text, pspecs,
                  max_len=max(256, prompt.shape[1] + args.max_new_tokens + 1))
    tokens, n, timing = dec.generate(prompt, max_new_tokens=args.max_new_tokens)
    print("answer token ids:", np.asarray(tokens)[0].tolist())
    print(f"{timing['tokens']} tokens at {timing['tokens_per_s']:.1f} t/s "
          f"(prefill {timing['prefill_s']*1e3:.0f}ms)")


if __name__ == "__main__":
    main()
