"""QAT fine-tune CLI — parity with the reference's ``train.py`` (argparse flags
with env-var override, reference ``train.py:22-46`` + ``utils/scripting.py``).

Two modes:

* **VLM mode** (``--llava-root`` + ``--coco-root`` + ``--tokenizer``): the
  reference's actual core (``train.py:146-338``) — LLaVA-Instruct conversations
  over COCO images, frozen vision tower → embedding splice → quantized text
  decoder loss → SGD, periodic held-out validation + sample generation.
* **Synthetic mode** (default): random-token LM batches for smoke/e2e
  validation of the machinery without data on disk.

Usage:

    python -m ternary_vllm_tpu.cli.train --quantization ternary \
        --llava-root /data/LLaVA-Instruct-150K --coco-root /data/coco \
        --tokenizer /path/tokenizer.json \
        --checkpoint /path/model.safetensors --epochs 1
"""

from __future__ import annotations

import argparse
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
from ternary_vllm_tpu.train.qat import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    make_vlm_train_step,
)
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
    p.add_argument("--val-samples", type=int, default=8,
                   help="held-out LLaVA samples for the validation loss")
    p.add_argument("--use-wandb", action="store_true")
    p.add_argument("--checkpoint", default=None, help="dense .safetensors to start from")
    p.add_argument("--llava-root", default=None)
    p.add_argument("--coco-root", default=None)
    p.add_argument("--llava-file", default="conversation_58k.json")
    p.add_argument("--tokenizer", default=None,
                   help="path to a tokenizer.json (HF `tokenizers` format) or "
                        "'byte' for the built-in utf-8 byte tokenizer (tests)")
    p.add_argument("--out", default="checkpoints")
    p.add_argument("--tiny", action="store_true", help="tiny config smoke mode")
    p.add_argument("--max-steps", type=int, default=0, help="cap steps (0 = full)")
    args = p.parse_args(argv)
    # env override, reference utils/scripting.py:4-5
    for name in vars(args):
        setattr(args, name, get_var(name, args))
    return args


def load_tokenizer(spec: str):
    """Returns (tokenize, bos_id, eos_id).

    ``tokenize(text)`` must add NO special tokens (the reference calls HF
    ``tokenizer(..., add_special_tokens=False)``, ``llava.py:70-87``).
    ``'byte'`` is a dependency-free utf-8 byte tokenizer (ids 2..257 → bytes,
    bos=1, eos=0) for fixtures and the tiny config (vocab 256 covers ASCII)."""
    if spec == "byte":
        return (lambda s: [min(2 + b, 255) for b in s.encode("utf-8")]), 1, 0
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(spec)
    from ternary_vllm_tpu.data.llava import ANSWER_EOS

    eos = tok.token_to_id(ANSWER_EOS)
    if eos is None:
        raise SystemExit(f"tokenizer has no {ANSWER_EOS!r} token")
    return (lambda s: tok.encode(s, add_special_tokens=False).ids), eos, eos


def _load_vlm_params(args, config: vlm.VLMConfig):
    if args.checkpoint:
        from safetensors import safe_open

        from ternary_vllm_tpu.convert.torch_import import (
            params_from_state_dict,
            vision_params_from_state_dict,
        )

        sd = {}
        with safe_open(args.checkpoint, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return {
            "vision": vision_params_from_state_dict(sd, config.vision),
            "text": params_from_state_dict(sd, config.text),
        }
    print("no --checkpoint: random init (structure-correct, untrained)")
    return vlm.init_vlm_params(jax.random.PRNGKey(0), config)


def train_vlm(args) -> None:
    """LLaVA-Instruct VLM QAT — mirrors reference ``train.py:146-338``."""
    from ternary_vllm_tpu.data.llava import (
        LLavaDataset,
        data_loader,
        make_collate_fn,
    )

    config = vlm.TINY_VLM_CONFIG if args.tiny else vlm.MOONDREAM_VLM_CONFIG
    tokenize, bos_id, eos_id = load_tokenizer(args.tokenizer)
    params = _load_vlm_params(args, config)

    qc = QuantConfig(
        quantization=args.quantization,
        neuron_scale=args.neuron_scale,
        scaling=args.scaling,
        start_skip=args.start_skip,
        last_skip=args.last_skip,
    )
    if args.quantization != "none":
        params["text"], specs = quantize_decoder_params(params["text"], config.text, qc)
        print("size:", size_report(params["text"], specs))
    else:
        specs = phi.layer_specs(config.text)

    dataset = LLavaDataset(args.llava_root, args.coco_root, file=args.llava_file)
    collate = make_collate_fn(
        tokenize,
        bos_id=bos_id,
        eos_id=eos_id,
        image_size=config.vision.image_size,
        img_tokens=config.vision.num_patches,
    )
    n_val = min(args.val_samples, max(len(dataset) - args.batch_size, 0))
    train_idx = list(range(n_val, len(dataset)))
    val_batches = []
    if n_val:
        val_items = [dataset[i] for i in range(n_val)]
        for s in range(0, n_val, args.batch_size):
            chunk = val_items[s : s + args.batch_size]
            if chunk:
                val_batches.append(
                    {k: jnp.asarray(v) for k, v in collate(chunk).items()}
                )

    steps_per_epoch = len(train_idx) // args.batch_size
    total_steps = args.max_steps or max(args.epochs * steps_per_epoch, 1)
    tc = TrainConfig(
        lr=args.lr,
        total_steps=total_steps,
        grad_accum_steps=args.grad_accum_steps,
        quantization=args.quantization,
        remat=not args.tiny,
    )
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    step_fn, eval_loss = make_vlm_train_step(config, specs, tc, tx)
    logger = MetricLogger("qat-train-vlm", use_wandb=args.use_wandb)

    class _Subset:
        def __init__(self, ds, idx):
            self.ds, self.idx = ds, idx

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            return self.ds[self.idx[i]]

    subset = _Subset(dataset, train_idx)
    step = 0
    t0 = time.time()
    for epoch in range(args.epochs):
        for batch in data_loader(subset, collate, args.batch_size, seed=epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, metrics = step_fn(params, opt_state, batch)
            extra = {}
            if args.val_every and (step + 1) % args.val_every == 0 and val_batches:
                # held-out val loss + sample generation (train.py:232-251,310-322)
                vl = float(np.mean([float(eval_loss(params, b)) for b in val_batches]))
                extra["val_loss"] = vl
                _print_sample(params, config, specs, val_batches[0], bos_id)
            logger.log(step, loss=float(metrics["loss"]), **extra)
            msg = f"step {step}: loss {float(metrics['loss']):.4f}"
            if "val_loss" in extra:
                msg += f"  val {extra['val_loss']:.4f}"
            print(msg, flush=True)
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break
    print(f"trained {step} steps in {time.time()-t0:.1f}s")
    _save(args, params, config.text, specs)


def _print_sample(params, config: vlm.VLMConfig, specs, val_batch, bos_id: int):
    """Greedy sample from a held-out image (reference ``train.py:310-322``)."""
    from ternary_vllm_tpu.serve.decode import Decoder

    img_embs = vlm.encode_image(params, config, val_batch["images"][:1])
    empty = jnp.zeros((1, 0), jnp.int32)
    emb = vlm.splice_prompt(params, img_embs, empty, empty, bos_id)
    dec = Decoder(
        params["text"], config.text, specs,
        max_len=min(config.text.max_position_embeddings, emb.shape[1] + 16),
    )
    sample, _, _ = dec.generate(emb.astype(jnp.float32), max_new_tokens=8)
    print(f"  sample tokens: {np.asarray(sample)[0].tolist()}")


def _save(args, params, text_config, specs):
    from ternary_vllm_tpu.convert.export import save_checkpoint
    from ternary_vllm_tpu.quant.quantize import pack_decoder_params

    text = params["text"] if "text" in params else params
    if args.quantization != "none":
        packed, pspecs = pack_decoder_params(text, specs)
    else:
        packed, pspecs = text, specs
    out = f"{args.out}/phi-q2-{args.quantization}-{args.start_skip}-{args.last_skip}"
    save_checkpoint(out, packed, text_config, pspecs)
    print(f"saved packed checkpoint to {out}")


def train_synthetic(args) -> None:
    """Random-token LM training: validates the QAT machinery end-to-end."""
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
    _save(args, params, config, specs)


def main(argv=None):
    args = parse_args(argv)
    if args.llava_root and args.coco_root:
        if not args.tokenizer:
            raise SystemExit(
                "--llava-root/--coco-root training needs --tokenizer "
                "(a tokenizer.json path, or 'byte' for the built-in byte "
                "tokenizer)"
            )
        train_vlm(args)
    else:
        train_synthetic(args)


if __name__ == "__main__":
    main()
