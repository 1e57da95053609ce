"""VLM composition: vision tower + embedding splice + Phi decoder.

Capability parity with the reference's moondream wiring:
* training-side splice ``[BOS | image_embs | text]`` (reference
  ``train.py:161-162``);
* inference-side splice at the ``<image>`` marker:
  ``[BOS | before | image_embs | after]`` (reference
  ``test_tflite.py:104-127``);
* 729 image tokens (``IMG_TOKENS``, ``train.py:144``).

Everything is a pure function over a combined param pytree
``{"vision": ..., "text": ...}``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models import phi, vision


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    vision: vision.VisionConfig = vision.MOONDREAM_VISION_CONFIG
    text: phi.PhiConfig = phi.MOONDREAM_PHI_CONFIG


MOONDREAM_VLM_CONFIG = VLMConfig()
TINY_VLM_CONFIG = VLMConfig(vision=vision.TINY_VISION_CONFIG, text=phi.TINY_PHI_CONFIG)


def init_vlm_params(key, config: VLMConfig, dtype=jnp.float32) -> Dict[str, Any]:
    kv, kt = jax.random.split(key)
    return {
        "vision": vision.init_vision_params(kv, config.vision, dtype),
        "text": phi.init_phi_params(kt, config.text, dtype),
    }


def encode_image(params, config: VLMConfig, images, vision_specs=None):
    """images (B,H,W,3) -> text-space image embeddings (B, 729, D_text)."""
    return vision.image_embeddings(params["vision"], config.vision, images, vision_specs)


def splice_train(params, img_embs, token_ids):
    """Training splice [BOS | img | text[1:]] (reference ``train.py:161-162``:
    token 0 is BOS, image embeddings inserted right after it)."""
    tok_embs = phi.embed_tokens(params["text"], token_ids)
    return jnp.concatenate([tok_embs[:, :1], img_embs.astype(tok_embs.dtype), tok_embs[:, 1:]], axis=1)


def splice_prompt(params, img_embs, before_ids, after_ids, bos_id: int):
    """Inference splice [BOS | before | img | after] (reference
    ``test_tflite.py:104-127``).  ``before_ids``/``after_ids``: (B, *) int32."""
    bos = phi.embed_tokens(params["text"], jnp.full((img_embs.shape[0], 1), bos_id, jnp.int32))
    before = phi.embed_tokens(params["text"], before_ids)
    after = phi.embed_tokens(params["text"], after_ids)
    return jnp.concatenate([bos, before, img_embs.astype(bos.dtype), after], axis=1)


def vlm_forward(
    params,
    config: VLMConfig,
    text_specs,
    images,
    token_ids,
    labels=None,
    vision_specs=None,
    attn_mask=None,
    stop_vision_gradient: bool = True,
    remat: bool = False,
):
    """Full VLM training forward: images+tokens -> logits (B, 1+729+T-1, V).

    ``stop_vision_gradient=True`` freezes the vision tower (the reference
    trains with the encoder under no_grad, ``train.py:157-159``).
    Labels, if given, must already account for the splice layout (the
    reference's collate fn emits image-placeholder positions, ``llava.py:58-108``).
    """
    img_embs = encode_image(params, config, images, vision_specs)
    if stop_vision_gradient:
        img_embs = jax.lax.stop_gradient(img_embs)
    embeds = splice_train(params, img_embs, token_ids)
    if attn_mask is not None and attn_mask.shape[1] != embeds.shape[1]:
        # text-length mask: splice in always-attended image positions.  The
        # collate fn (data/llava.py) already emits a spliced-length mask,
        # which passes through unchanged.
        n_img = img_embs.shape[1]
        img_mask = jnp.ones((attn_mask.shape[0], n_img), attn_mask.dtype)
        attn_mask = jnp.concatenate([attn_mask[:, :1], img_mask, attn_mask[:, 1:]], axis=1)
    logits, _ = phi.forward(
        params["text"], config.text, text_specs, embeds, None, 0, attn_mask,
        remat=remat,
    )
    return logits
