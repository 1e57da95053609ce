"""QAT training: optax SGD, STE grads, latent clipping, smoothBinary surgery.

Capability parity with the reference's training loop (reference
``train.py:149-341``), as pure jitted functions:

* element-wise grad clip to ±1 (``train.py:281-283``);
* SGD with the reference's LR schedule — 10% linear warmup from 0.1·LR to LR,
  then ``0.1·LR + 0.9·LR·(1+cos(π(x−0.1)))/2`` (``train.py:191-196``,
  replicated verbatim including its un-renormalized cosine argument);
* post-step clipping of latent quantized weights to ±1
  (``binary/utils.py:74-77``), fused into the update;
* non-finite-loss guard: a step with a non-finite loss applies no update
  (``train.py:275-278``) — jit-safe via ``jnp.where``, not control flow;
* smoothBinary biobjective gradient surgery with *global* (cross-parameter)
  norms (``binary/modules.py:149-176``) + convergence stats
  (``modules.py:179-186``);
* optional gradient checkpointing (``jax.checkpoint`` over decoder layers —
  the analogue of ``gradient_checkpointing_enable``, ``train.py:220``);
* gradient accumulation via ``optax.MultiSteps`` (``train.py:279``).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ternary_vllm_tpu.models import phi


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-5
    total_steps: int = 1000
    grad_accum_steps: int = 1
    grad_clip: float = 1.0
    quantization: str = "ternary"
    remat: bool = False


def lr_schedule(lr: float, total_steps: int):
    """Reference ``lr_schedule`` (``train.py:191-196``) as an optax schedule."""

    def schedule(step):
        x = step / total_steps
        warm = 0.1 * lr + 0.9 * lr * x / 0.1
        decay = 0.1 * lr + 0.9 * lr * (1 + jnp.cos(math.pi * (x - 0.1))) / 2
        return jnp.where(x < 0.1, warm, decay)

    return schedule


def cross_entropy_loss(logits, labels):
    """Causal-LM loss, HF semantics: shift by one, ignore label −100
    (the collate fn labels only answer tokens, reference
    ``training/datasets/llava.py:58-108``)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def _latent_paths(specs):
    """(layer_idx, name) of quantized linears with trainable latents."""
    out = []
    for i, spec in enumerate(specs):
        for name, s in spec.items():
            if s.kind == "qat":
                out.append((i, name, s.mode))
    return out


def clip_latent_params(params, specs):
    """Clip latent quantized weights to ±1 after each optimizer step
    (reference ``clip_binary_weights``, ``binary/utils.py:74-77``)."""
    layers = list(params["layers"])
    for i, name, _ in _latent_paths(specs):
        layer = dict(layers[i])
        p = dict(layer[name])
        p["latent"] = jnp.clip(p["latent"], -1.0, 1.0)
        layer[name] = p
        layers[i] = layer
    out = dict(params)
    out["layers"] = layers
    return out


def biobjective_gradients(grads, params, specs):
    """smoothBinary global gradient surgery (``binary/modules.py:149-176``):

    * ``norm_g`` = global L2 norm over ALL task grads; ``norm_bg`` = global L2
      norm over all binarization grads ``-sign(latent)``;
    * latent grads ← (g/‖g‖ + bg/‖bg‖)·(‖g‖+‖bg‖)/2;
    * every other grad ← (g/‖g‖)·(‖g‖+‖bg‖).
    """
    sb_paths = [(i, n) for i, n, mode in _latent_paths(specs) if mode == "smoothBinary"]
    if not sb_paths:
        return grads
    sb_set = set(sb_paths)

    leaves = jax.tree_util.tree_leaves(grads)
    norm_g = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    norm_bg_sq = 0.0
    for i, n in sb_paths:
        norm_bg_sq = norm_bg_sq + jnp.sum(
            jnp.square(jnp.sign(params["layers"][i][n]["latent"]))
        )
    norm_bg = jnp.sqrt(norm_bg_sq)

    def rescale_other(g):
        return jnp.where(norm_g > 0.0, (g / norm_g) * (norm_g + norm_bg), g)

    new_grads = jax.tree_util.tree_map(rescale_other, grads)
    layers = list(new_grads["layers"])
    for i, n in sb_set:
        layer = dict(layers[i])
        p = dict(layer[n])
        g = grads["layers"][i][n]["latent"]
        bg = -jnp.sign(params["layers"][i][n]["latent"])
        ng = jnp.where(norm_g > 0.0, g / norm_g, 0.0)
        nbg = jnp.where(norm_bg > 0.0, bg / norm_bg, 0.0)
        p["latent"] = (ng + nbg) * (norm_g + norm_bg) * 0.5
        layer[n] = p
        layers[i] = layer
    new_grads = dict(new_grads)
    new_grads["layers"] = layers
    return new_grads


def smooth_binary_stats(params, specs, eps: float = 1e-3):
    """Fraction of smoothBinary latents within eps of ±1
    (reference ``compute_smooth_binary_stats``, ``modules.py:179-186``)."""
    total = 0
    converged = jnp.zeros((), jnp.int32)
    for i, n, mode in _latent_paths(specs):
        if mode != "smoothBinary":
            continue
        w = params["layers"][i][n]["latent"]
        total += w.size
        converged = converged + jnp.sum(1.0 - jnp.abs(w) < eps)
    if total == 0:
        return 0, jnp.zeros(())
    return total, converged / total


def make_optimizer(tc: TrainConfig):
    tx = optax.chain(
        optax.clip(tc.grad_clip),  # element-wise value clip (train.py:281-283)
        optax.sgd(lr_schedule(tc.lr, tc.total_steps)),
    )
    if tc.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.grad_accum_steps)
    return tx


def make_train_step(config: phi.PhiConfig, specs, tc: TrainConfig, tx):
    """Build a jitted QAT train step over (params, opt_state, batch).

    batch: dict with ``inputs_embeds`` (B,T,D) **or** ``input_ids`` (B,T),
    ``labels`` (B,T; −100 = ignore), optional ``attn_mask`` (B,T) bool.
    Returns (params, opt_state, metrics dict).
    """
    specs_frozen = phi.freeze_specs(specs)
    spec_dicts = tuple({k: v for k, v in t} for t in specs_frozen)

    def loss_fn(params, batch):
        if "inputs_embeds" in batch:
            embeds = batch["inputs_embeds"]
        else:
            embeds = phi.embed_tokens(params, batch["input_ids"])
        logits, _ = phi.forward(
            params,
            config,
            specs_frozen,
            embeds,
            None,
            0,
            batch.get("attn_mask"),
            remat=tc.remat,
        )
        return cross_entropy_loss(logits, batch["labels"])

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        finite = jnp.isfinite(loss)
        # zero out grads on non-finite loss → update is a no-op (train.py:275-278)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        if tc.quantization == "smoothBinary":
            grads = biobjective_gradients(grads, params, spec_dicts)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = clip_latent_params(params, spec_dicts)
        metrics = {"loss": loss, "finite": finite}
        if tc.quantization == "smoothBinary":
            _, frac = smooth_binary_stats(params, spec_dicts)
            metrics["fraction_converged"] = frac
        return params, opt_state, metrics

    return train_step


def make_vlm_train_step(vlm_config, text_specs, tc: TrainConfig, tx, vision_specs=None):
    """QAT train step for the full VLM — the reference's actual training core
    (``train.py:149-189``: frozen vision encoder → embedding splice → text
    decoder loss → SGD).

    Params pytree is ``{"vision": ..., "text": ...}``; only the text decoder
    carries quantized latents, and the vision tower is frozen via
    ``stop_gradient`` (its grads are exact zeros, so SGD leaves it unchanged).
    batch: dict with ``images`` (B,H,W,3), ``input_ids`` (B,T), ``labels``
    (B, 1+img_tokens+T−1; −100 = ignore), optional ``attn_mask`` (B,T) —
    the layout :func:`ternary_vllm_tpu.data.llava.make_collate_fn` emits.

    Returns ``(train_step, eval_loss)``; ``eval_loss(params, batch)`` is the
    jitted validation loss over the same spliced forward (reference
    ``train.py:232-251``)."""
    from ternary_vllm_tpu.models import vlm as vlm_mod

    specs_frozen = phi.freeze_specs(text_specs)
    spec_dicts = tuple({k: v for k, v in t} for t in specs_frozen)

    def loss_fn(params, batch):
        logits = vlm_mod.vlm_forward(
            params,
            vlm_config,
            specs_frozen,
            batch["images"],
            batch["input_ids"],
            vision_specs=vision_specs,
            attn_mask=batch.get("attn_mask"),
            stop_vision_gradient=True,
            remat=tc.remat,
        )
        return cross_entropy_loss(logits, batch["labels"])

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        if tc.quantization == "smoothBinary":
            grads = dict(grads)
            grads["text"] = biobjective_gradients(
                grads["text"], params["text"], spec_dicts
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = dict(params)
        params["text"] = clip_latent_params(params["text"], spec_dicts)
        metrics = {"loss": loss, "finite": finite}
        if tc.quantization == "smoothBinary":
            _, frac = smooth_binary_stats(params["text"], spec_dicts)
            metrics["fraction_converged"] = frac
        return params, opt_state, metrics

    return train_step, jax.jit(loss_fn)
