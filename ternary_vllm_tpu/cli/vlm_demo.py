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
    p.add_argument(
        "--questions", type=int, default=1,
        help="N>1: serve N questions about the SAME image through the "
        "continuous-batching engine with the image prefix KV cached once "
        "(the reference re-prefills its 729 image tokens per question)",
    )
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

    if args.questions > 1:
        from ternary_vllm_tpu.serve.engine import Engine

        prefix = vlm.splice_prompt(
            params, img_embs, jnp.zeros((1, 0), jnp.int32),
            jnp.zeros((1, 0), jnp.int32), bos_id=1,
        )
        plen = prefix.shape[1]
        cap = 2 * max(256, plen + 64) if not args.tiny else 128
        eng = Engine(params["text"], cfg.text, pspecs, max_batch=4, max_len=cap,
                     burst=8, buckets=(8, 16, 32, 64, 128, 256, 512, 1024))
        t0 = time.perf_counter()
        pid = eng.register_prefix(prefix)
        print(f"image prefix ({plen} tokens) prefilled+cached once "
              f"in {time.perf_counter()-t0:.2f}s")
        rng = np.random.default_rng(0)
        for i in range(args.questions):
            qi = jnp.asarray(rng.integers(2, cfg.text.vocab_size, (1, int(q_ids.shape[1]))))
            eng.add_request(phi.embed_tokens(params["text"], qi),
                            max_new_tokens=args.max_new_tokens, prefix_id=pid)
        t0 = time.perf_counter()
        done = eng.run()
        dt = time.perf_counter() - t0
        gen = sum(len(r.tokens) for r in done)
        for r in sorted(done, key=lambda r: r.request_id):
            print(f"  q{r.request_id}: {r.tokens}")
        print(f"{args.questions} questions, {gen} tokens in {dt:.2f}s "
              f"-> {gen/dt:.1f} t/s aggregate (image encoded+prefilled once)")
        return

    prompt = vlm.splice_prompt(params, img_embs, jnp.zeros((1, 0), jnp.int32), q_ids, bos_id=1)

    dec = Decoder(params["text"], cfg.text, pspecs,
                  max_len=max(256, prompt.shape[1] + args.max_new_tokens + 1))
    tokens, n, timing = dec.generate(prompt, max_new_tokens=args.max_new_tokens)
    print("answer token ids:", np.asarray(tokens)[0].tolist())
    print(f"{timing['tokens']} tokens at {timing['tokens_per_s']:.1f} t/s "
          f"(prefill {timing['prefill_s']*1e3:.0f}ms)")


if __name__ == "__main__":
    main()
