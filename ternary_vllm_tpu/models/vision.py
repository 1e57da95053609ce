"""SigLIP-style ViT vision encoder + projection, functional JAX.

The reference delegates vision to the torch Moondream2 encoder at both train
and inference time (reference ``train.py:157-159``, ``test_tflite.py:82-91``:
``vision_encoder.encoder(images)`` then ``vision_encoder.projection``,
yielding 729 image tokens of text-model width).  This module is the TPU-native
equivalent: a standard pre-LN ViT (patch-embed linear, fused-QKV attention,
GELU MLP, final LN) plus a 2-layer projection MLP, with the same pluggable
quantized Linears as the Phi decoder so the whole tower can run ternary
(BASELINE.md config 3: ternary ViT-B/so400m embedding throughput).

Default config matches Moondream2's SigLIP-so400m tower: 378x378 images,
14x14 patches -> 27*27 = 729 tokens (``IMG_TOKENS=729``, reference
``train.py:144``), width 1152, 27 layers, MLP 4304.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models.phi import (
    DENSE,
    LinearSpec,
    _layer_norm,
    apply_linear,
)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 378
    patch_size: int = 14
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    intermediate_size: int = 4304
    layer_norm_eps: float = 1e-6
    proj_hidden_size: int = 8192
    proj_out_size: int = 2048  # text-model width

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


MOONDREAM_VISION_CONFIG = VisionConfig()

TINY_VISION_CONFIG = VisionConfig(
    image_size=28,
    patch_size=14,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    intermediate_size=128,
    proj_hidden_size=96,
    proj_out_size=64,
)

#: quantizable linears inside one ViT block
VIT_QUANT_LINEARS = ("qkv", "proj", "fc1", "fc2")


def vit_layer_specs(
    config: VisionConfig,
    default: LinearSpec = DENSE,
    quant: Optional[LinearSpec] = None,
    start_skip: int = 0,
    last_skip: int = 0,
):
    out = []
    n = config.num_layers
    for i in range(n):
        if quant is not None and start_skip <= i < n - last_skip:
            out.append({name: quant for name in VIT_QUANT_LINEARS})
        else:
            out.append({name: default for name in VIT_QUANT_LINEARS})
    return tuple(out)


def _init_linear(key, k, n, dtype, std=0.02):
    return {
        "w": (jax.random.normal(key, (k, n)) * std).astype(dtype),
        "b": jnp.zeros((n,), dtype),
    }


def _init_ln(n, dtype):
    return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def init_vision_params(key, config: VisionConfig, dtype=jnp.float32) -> Dict[str, Any]:
    d, f = config.hidden_size, config.intermediate_size
    patch_dim = 3 * config.patch_size * config.patch_size
    keys = jax.random.split(key, config.num_layers + 4)
    layers = []
    for i in range(config.num_layers):
        k1, k2, k3, k4 = jax.random.split(keys[i], 4)
        layers.append(
            {
                "ln1": _init_ln(d, dtype),
                "qkv": _init_linear(k1, d, 3 * d, dtype),
                "proj": _init_linear(k2, d, d, dtype),
                "ln2": _init_ln(d, dtype),
                "fc1": _init_linear(k3, d, f, dtype),
                "fc2": _init_linear(k4, f, d, dtype),
            }
        )
    return {
        "patch_embed": _init_linear(keys[-4], patch_dim, d, dtype),
        "pos_embed": (jax.random.normal(keys[-3], (config.num_patches, d)) * 0.02).astype(dtype),
        "layers": layers,
        "ln_post": _init_ln(d, dtype),
        "projection": {
            "fc1": _init_linear(keys[-2], d, config.proj_hidden_size, dtype),
            "fc2": _init_linear(keys[-1], config.proj_hidden_size, config.proj_out_size, dtype),
        },
    }


def patchify(images, patch_size: int):
    """(B, H, W, 3) -> (B, n_patches, 3*p*p), row-major patch order."""
    b, h, w, c = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, c)
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def _vit_attention(p, spec, config, x):
    b, t, d = x.shape
    h, hd = config.num_heads, config.head_dim
    qkv = apply_linear(spec["qkv"], p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return apply_linear(spec["proj"], p["proj"], out)


def encode_image(params, config: VisionConfig, images, specs=None, remat: bool = False):
    """images (B, H, W, 3) float in [-1, 1]-ish -> patch features (B, T, D).

    Pre-LN ViT: x += attn(ln1(x)); x += mlp(ln2(x)); final LN."""
    if specs is None:
        specs = vit_layer_specs(config)
    x = patchify(images, config.patch_size)
    x = apply_linear(DENSE, params["patch_embed"], x)
    x = x + params["pos_embed"][None].astype(x.dtype)

    def block(p, spec, x):
        x = x + _vit_attention(p, spec, config, _layer_norm(p["ln1"], x, config.layer_norm_eps))
        h = apply_linear(spec["fc1"], p["fc1"], _layer_norm(p["ln2"], x, config.layer_norm_eps), act="gelu_new")
        return x + apply_linear(spec["fc2"], p["fc2"], h)

    for p, spec in zip(params["layers"], specs):
        if remat:
            x = jax.checkpoint(lambda pp, xx, s_=spec: block(pp, s_, xx))(p, x)
        else:
            x = block(p, spec, x)
    return _layer_norm(params["ln_post"], x, config.layer_norm_eps)


def project_features(params, feats):
    """Vision features -> text-model width (the reference's
    ``vision_encoder.projection``, ``train.py:158``): 2-layer GELU MLP."""
    h = apply_linear(DENSE, params["projection"]["fc1"], feats, act="gelu_new")
    return apply_linear(DENSE, params["projection"]["fc2"], h)


def image_embeddings(params, config: VisionConfig, images, specs=None):
    """Full tower: images -> (B, num_patches, proj_out_size) text-space tokens."""
    return project_features(params, encode_image(params, config, images, specs))
