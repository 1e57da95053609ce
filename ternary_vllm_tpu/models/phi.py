"""Phi-1.5 (Moondream2 text decoder) in functional JAX — pytree params, jit-safe.

Capability parity with the reference's Keras re-implementation
(reference ``impl/tf/moondream/model.py:18-105``, ``layers.py:18-411``):
parallel attention+MLP residual blocks with a single shared LayerNorm,
fused Wqkv, partial rotary embeddings (factor 0.5), GQA-capable KV handling,
gelu_new MLP, LN+Dense LM head, and the functional cache-threading signature
``(logits, next_cache) = step(embeds, cache)`` (``model.py:63-105``) — which is
already the JAX-idiomatic shape.

TPU-first deviations from the reference:
* The KV cache is a **fixed-capacity** preallocated buffer updated with
  ``lax.dynamic_update_slice`` at the current position — never concatenated.
  The reference grows its cache every token and re-allocates interpreter
  tensors per step (``test_tflite.py:171-173``), which forces recompilation /
  realloc; fixed shapes keep one compiled program for the whole decode.
* Quantized Linears are pluggable per layer via :class:`LinearSpec`:
  ``dense`` (bf16 matmul), ``qat`` (latent weights through an STE quantizer —
  training path), or ``packed`` (uint8 planar-packed weights through the
  Pallas unpack-matmul kernel — inference path).
* Everything is a pure function of (params, inputs); params are pytrees so
  ``jax.jit`` / ``grad`` / ``shard_map`` compose for free.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.ops.quantizers import QUANTIZERS
from ternary_vllm_tpu.ops.ternary_matmul import _ACTS, quantized_matmul


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    """Decoder config (defaults = Moondream2 Phi, reference ``layers.py:382-411``)."""

    vocab_size: int = 51200
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 24
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5
    max_position_embeddings: int = 2048
    hidden_act: str = "gelu_new"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.partial_rotary_factor * self.head_dim)

    @property
    def qkv_dim(self) -> int:
        """Wqkv output width: h query heads + 2·kvh key/value heads (GQA:
        ``num_key_value_heads < num_attention_heads`` shrinks the K/V thirds;
        equals ``3 * hidden_size`` for MHA)."""
        return (self.num_attention_heads + 2 * self.num_key_value_heads) * self.head_dim


MOONDREAM_PHI_CONFIG = PhiConfig()

#: small config for tests / CI (structure-identical, CPU-fast)
TINY_PHI_CONFIG = PhiConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=128,
)


@dataclasses.dataclass(frozen=True)
class LinearSpec:
    """Static description of one Linear's implementation."""

    kind: str = "dense"  # dense | qat | packed
    mode: str = "ternary"  # ternary | binary | binary01 | smoothBinary (qat/packed)
    clip_val: Optional[float] = 100.0
    impl: str = "auto"  # kernel dispatch for packed
    fmt: str = "q2"  # packed storage: q2 (bit-planes) | q4 (nibble int4)
    a8: bool = False  # packed only: int8-quantized activations (w2a8 kernel)
    # fused out2 specs only: packed-row count of the first stacked block
    # (out_proj).  pack_decoder_params pads K to k_multiple before packing, so
    # the split point cannot be derived from the logical K alone; it is
    # recorded at fuse time (quant/quantize.fuse_packed_decoder_params).
    rows1: Optional[int] = None

    def __post_init__(self):
        if self.kind not in ("dense", "qat", "packed"):
            raise ValueError(f"bad LinearSpec.kind {self.kind}")


DENSE = LinearSpec(clip_val=None)

#: profiling hook (tests/benchmarks only): when True, decoder layers skip
#: rope/cache/attention and feed ln(x) straight into out_proj — isolates the
#: quantized-matmul cost from the attention path in ablations.
_DEBUG_SKIP_ATTENTION = False

#: profiling hook (tests/benchmarks only): when True, decode-path KV-cache
#: writes are skipped (attention reads the stale cache) — isolates the cost
#: of the dynamic_update_slice cache updates in ablations.
_DEBUG_SKIP_CACHE_WRITE = False

#: names of the quantizable linears inside one decoder layer
QUANT_LINEARS = ("wqkv", "out_proj", "fc1", "fc2")

#: decode path (t==1, bf16 cache): fuse rope + KV-cache write + flash
#: attention into ONE Pallas dispatch per layer (ops/fused_decode_attention);
#: False falls back to rope -> dynamic_update_slice -> decode_attention.
USE_FUSED_DECODE_ATTENTION = True

#: decode path (t==1, batch 1, bf16 row-major cache, fused out2): merge the
#: attention dispatch into the dual out2 kernel's grid — TWO Pallas
#: dispatches per decode layer instead of three (ops/attn_out2_fused;
#: DESIGN.md §6 round-5 7B batch-1 study).  Off-TPU / unsupported shapes
#: fall back to the composed pair inside attn_dual_decode itself.
#: Env override TVT_ATTN_OUT2_FUSION=0 for A/B measurement.
USE_ATTN_OUT2_FUSION = os.environ.get("TVT_ATTN_OUT2_FUSION", "1") == "1"


def freeze_specs(specs):
    """tuple-of-dicts → hashable tuple-of-tuples (for use as a jit static arg)."""
    if isinstance(specs, tuple) and specs and isinstance(specs[0], tuple):
        return specs
    return tuple(tuple(sorted(d.items())) for d in specs)


def _spec_dicts(specs):
    if isinstance(specs, tuple) and specs and isinstance(specs[0], tuple):
        return tuple(dict(t) for t in specs)
    return specs


def layer_specs(
    config: PhiConfig,
    default: LinearSpec = DENSE,
    quant: Optional[LinearSpec] = None,
    start_skip: int = 0,
    last_skip: int = 0,
) -> Tuple[Dict[str, LinearSpec], ...]:
    """Per-layer spec table; quantize all but the first ``start_skip`` / last
    ``last_skip`` blocks (reference ``binary/utils.py:14-20``)."""
    out = []
    n = config.num_hidden_layers
    for i in range(n):
        if quant is not None and start_skip <= i < n - last_skip:
            out.append({name: quant for name in QUANT_LINEARS})
        else:
            out.append({name: default for name in QUANT_LINEARS})
    return tuple(out)


# ---------------------------------------------------------------------------
# Param init
# ---------------------------------------------------------------------------


def _init_linear(key, k, n, dtype, std=0.02):
    wk, _ = jax.random.split(key)
    return {
        "w": (jax.random.normal(wk, (k, n)) * std).astype(dtype),
        "b": jnp.zeros((n,), dtype),
    }


def _init_ln(n, dtype):
    return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def init_phi_params(key, config: PhiConfig, dtype=jnp.float32) -> Dict[str, Any]:
    d, f, v = config.hidden_size, config.intermediate_size, config.vocab_size
    keys = jax.random.split(key, config.num_hidden_layers + 2)
    layers = []
    for i in range(config.num_hidden_layers):
        k1, k2, k3, k4 = jax.random.split(keys[i], 4)
        layers.append(
            {
                "ln": _init_ln(d, dtype),
                "wqkv": _init_linear(k1, d, config.qkv_dim, dtype),
                "out_proj": _init_linear(k2, d, d, dtype),
                "fc1": _init_linear(k3, d, f, dtype),
                "fc2": _init_linear(k4, f, d, dtype),
            }
        )
    return {
        "wte": (jax.random.normal(keys[-2], (v, d)) * 0.02).astype(dtype),
        "layers": layers,
        "lm_head": {
            "ln": _init_ln(d, dtype),
            "linear": _init_linear(keys[-1], d, v, dtype),
        },
    }


# ---------------------------------------------------------------------------
# KV cache — fixed capacity, functional
# ---------------------------------------------------------------------------


def init_cache(config: PhiConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               layout: str = "rowmajor"):
    """Preallocated KV cache: list of per-layer (k, v), each
    ``(batch, kv_heads, max_len, head_dim)``.  Position threading is explicit
    (the ``pos`` argument of :func:`forward`); the reference's growing
    concat-cache (``layers.py:267-268``) is the anti-pattern this replaces.

    ``dtype="int8"`` selects the quantized cache (BASELINE north star:
    "activations and KV-cache stay INT8/BF16"): per-layer 4-tuples
    ``(k_q int8, k_scale, v_q int8, v_scale)`` with per-(b, head, position)
    absmax scales — halves cache HBM traffic vs bf16.  Scales are stored
    LANE-major ``(B, KVH, 1, T)`` so the attention kernels can scale the
    logits (per-position, lane dim) instead of dequantizing K, and scale
    the probabilities instead of dequantizing V — no (chunk, hd)-sized
    dequant multiplies, and the scale reads vectorize along lanes.

    ``layout="tmajor"`` stores K/V (and int8 codes) TRANSPOSED,
    ``(batch, kv_heads, head_dim, max_len)`` — for head_dim < 128 the
    row-major layout is lane-padded to 128 inside jitted decode loops
    (pallas forces its default layout on operands), so the decode-attention
    kernels stream 2× the logical KV bytes; T-major removes the padding
    (measured 176 → 97 µs/layer at 8k live, docs/DESIGN.md §6 round 4).
    Only the single-token fused decode path supports T-major — prefill
    (t > 1) must run on a row-major cache and convert via
    :func:`transpose_cache`."""
    if layout == "tmajor":
        shape = (batch, config.num_key_value_heads, config.head_dim, max_len)
    else:
        shape = (batch, config.num_key_value_heads, max_len, config.head_dim)
    sshape = (batch, config.num_key_value_heads, 1, max_len)
    if dtype in ("int8", jnp.int8):
        return [
            (
                jnp.zeros(shape, jnp.int8),
                jnp.ones(sshape, jnp.bfloat16),
                jnp.zeros(shape, jnp.int8),
                jnp.ones(sshape, jnp.bfloat16),
            )
            for _ in range(config.num_hidden_layers)
        ]
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(config.num_hidden_layers)
    ]


def cache_bytes(config: PhiConfig, batch: int, max_len: int, dtype="bf16") -> int:
    """Exact HBM bytes of :func:`init_cache` — the serving-side sizing
    formula (round-3 VERDICT weak #6): per slot and layer, K + V cost
    ``2 · KVH · hd · capacity · itemsize`` plus, for int8, two lane-major
    bf16 scale rows of ``KVH · capacity``."""
    kvh, hd, L = config.num_key_value_heads, config.head_dim, config.num_hidden_layers
    if dtype in ("int8", jnp.int8):
        per = 2 * kvh * hd * max_len * 1 + 2 * kvh * max_len * 2
    else:
        itemsize = jnp.dtype(dtype).itemsize if dtype != "bf16" else 2
        per = 2 * kvh * hd * max_len * itemsize
    return batch * L * per


def transpose_cache(cache):
    """Row-major per-layer cache tuples → T-major (or back: the op is an
    involution).  bf16 tuples transpose both arrays; int8 4-tuples transpose
    only the code arrays (scales are lane-major ``(B, KVH, 1, T)`` in both
    layouts)."""
    out = []
    for kv in cache:
        if len(kv) == 2:
            out.append(tuple(jnp.swapaxes(a, 2, 3) for a in kv))
        else:
            kq, ks, vq, vs = kv
            out.append((jnp.swapaxes(kq, 2, 3), ks, jnp.swapaxes(vq, 2, 3), vs))
    return out


def cache_layout(kv, config: PhiConfig) -> str:
    """Detect a per-layer cache tuple's layout from its shapes.  Row-major is
    ``(B, KVH, T, hd)``; T-major is ``(B, KVH, hd, T)``.  Ambiguous only when
    capacity == head_dim, which the tmajor policy never produces (it requires
    capacity ≥ 2048 and head_dim < 128) — row-major wins the tie."""
    s = kv[0].shape
    if s[2] == config.head_dim and s[3] != config.head_dim:
        return "tmajor"
    return "rowmajor"


def _quantize_kv(x):
    """(B, KVH, T, hd) float -> (int8 codes, lane-major scale (B, KVH, 1, T))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.transpose(0, 1, 3, 2).astype(jnp.bfloat16)


def _dequantize_kv(q, scale, dtype):
    """q (B, KVH, T, hd) int8, scale (B, KVH, 1, T) -> float (B, KVH, T, hd)."""
    s = scale.transpose(0, 1, 3, 2).astype(dtype)
    return (q.astype(dtype) * s).astype(dtype)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def apply_linear(spec: LinearSpec, p: Dict[str, Any], x, act: Optional[str] = None):
    """One Linear under its spec.  Contract (all kinds):
    ``y = act(clip((x @ W) * scale + bias, ±clip))`` with scale/clip only for
    quantized kinds (reference ``binary/modules.py:93-110``,
    ``impl/tf/moondream/ternary.py:210-250``)."""
    if spec.kind == "dense":
        y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
        y = y + p["b"]
        # dequantized-dense specs (quantize.unpack_decoder_params) carry the
        # packed spec's clip so the prefill-path numerics match decode's
        # packed kernels; plain DENSE has clip_val=None (no clip, as before)
        if spec.clip_val is not None:
            y = jnp.clip(y, -abs(spec.clip_val), abs(spec.clip_val))
        return _ACTS[act](y).astype(x.dtype)
    if spec.kind == "qat":
        if spec.mode == "smoothBinary":
            # train: clipped latent weights; eval uses hard sign via packed kind
            w = jnp.clip(p["latent"], -1.0, 1.0).astype(x.dtype)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32) + p["b"]
        else:
            w = QUANTIZERS[spec.mode](p["latent"]).astype(x.dtype)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            y = y * p["scale"] + p["b"]
        if spec.clip_val is not None:
            y = jnp.clip(y, -abs(spec.clip_val), abs(spec.clip_val))
        return _ACTS[act](y).astype(x.dtype)
    # packed
    mode = "binary" if spec.mode == "smoothBinary" else spec.mode
    return quantized_matmul(
        x,
        p["packed"],
        mode=mode,
        scale=p.get("scale"),
        bias=p.get("b"),
        clip_val=spec.clip_val,
        act=act,
        impl=spec.impl,
        fmt=spec.fmt,
        a8=spec.a8,
    )


def _layer_norm(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _rope_cos_sin(positions, rotary_dim, theta, dtype):
    """cos/sin for absolute ``positions`` (any shape), partial-RoPE dim.

    Matches reference ``layers.py:81-113``: inv_freq over even indices, angles
    duplicated (concat(freqs, freqs)) to cover the rotary_dim."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., rd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (..., rd)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q, k, cos, sin, rotary_dim):
    """Partial RoPE on the first ``rotary_dim`` of head_dim
    (reference ``layers.py:53-80,244-259``). q/k: (B, H, T, hd);
    cos/sin: (T, rd) or (B, T, rd)."""
    if cos.ndim == 2:
        cs = cos[None, None, :, :]
        sn = sin[None, None, :, :]
    else:
        cs = cos[:, None, :, :]
        sn = sin[:, None, :, :]

    def rot(x):
        xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
        xr = xr * cs + _rotate_half(xr) * sn
        return jnp.concatenate([xr, xp], axis=-1)

    return rot(q), rot(k)


def _repeat_kv(x, n_rep):
    if n_rep == 1:
        return x
    b, h, t, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, n_rep, t, d)).reshape(b, h * n_rep, t, d)


def _attention(q, k, v, mask):
    """Softmax attention; q (B,H,T,hd), k/v (B,H,S,hd), mask additive (B,1,T,S)
    or (1,1,T,S).  f32 softmax for stability (reference ``layers.py:130-141``)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _decoder_layer(
    p,
    spec: Dict[str, LinearSpec],
    config: PhiConfig,
    x,
    cos,
    sin,
    mask,
    kv: Optional[Tuple],
    pos,
    pure_causal: bool = False,
):
    """Parallel attn+MLP block: ``out = attn(ln(x)) + mlp(ln(x)) + x``
    (reference ``layers.py:332-348``). Returns (out, new_kv)."""
    b, t, d = x.shape
    h, hd = config.num_attention_heads, config.head_dim
    kvh = config.num_key_value_heads
    fused = "in_proj" in spec

    # fused path: the LN moves into the in_proj kernel prologue (one fewer
    # XLA dispatch per layer at decode); other paths need hidden explicitly
    hidden = None if fused else _layer_norm(p["ln"], x, config.layer_norm_eps)

    if _DEBUG_SKIP_ATTENTION and not fused:
        qkv = apply_linear(spec["wqkv"], p["wqkv"], hidden)
        attn = apply_linear(spec["out_proj"], p["out_proj"], hidden + 0.0 * qkv[..., :d])
        mlp = apply_linear(spec["fc1"], p["fc1"], hidden, act=config.hidden_act)
        mlp = apply_linear(spec["fc2"], p["fc2"], mlp)
        return attn + mlp + x, kv

    if fused:
        # one kernel for [Wqkv | fc1]; gelu on the fc1 half via act_split
        from ternary_vllm_tpu.ops.ternary_matmul import quantized_matmul as _qm

        both = _qm(
            x,
            p["in_proj"]["packed"],
            mode=spec["in_proj"].mode,
            scale=p["in_proj"]["scale"],
            bias=p["in_proj"]["b"],
            clip_val=spec["in_proj"].clip_val,
            act=config.hidden_act,
            act_split=config.qkv_dim,
            impl=spec["in_proj"].impl,
            a8=spec["in_proj"].a8,
            ln=(p["ln"]["scale"], p["ln"]["bias"]),
            ln_eps=config.layer_norm_eps,
        )
        qkv, mlp_hidden = both[..., : config.qkv_dim], both[..., config.qkv_dim :]
    else:
        qkv = apply_linear(spec["wqkv"], p["wqkv"], hidden)
    # GQA split: h query heads then kvh K heads then kvh V heads
    qd, kvd = h * hd, kvh * hd
    q = qkv[..., :qd]
    k = qkv[..., qd : qd + kvd]
    v = qkv[..., qd + kvd :]
    q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)

    # single-token decode on a bf16 tuple or int8 4-tuple cache: rope +
    # (quantized) cache write + attention fuse into one Pallas dispatch/layer
    use_fused_attn = (
        USE_FUSED_DECODE_ATTENTION
        and kv is not None
        and t == 1
        and len(kv) in (2, 4)
        and not _DEBUG_SKIP_CACHE_WRITE
    )
    if use_fused_attn:
        rd = config.rotary_dim
        cs = jnp.broadcast_to(cos.reshape(-1, rd), (b, rd))
        sn = jnp.broadcast_to(sin.reshape(-1, rd), (b, rd))
        tmajor = cache_layout(kv, config) == "tmajor"
        if (
            fused
            and USE_ATTN_OUT2_FUSION
            and len(kv) == 2
            and not tmajor
            and b == 1
            and spec["out2"].a8
        ):
            # single-dispatch layer tail: attention inside the dual out2
            # kernel's prologue (ops/attn_out2_fused; falls back to the
            # composed pair off-TPU / for unsupported shapes)
            from ternary_vllm_tpu.ops.attn_out2_fused import attn_dual_decode

            o2 = p["out2"]
            o2_mode = spec["out2"].mode
            rows1 = spec["out2"].rows1 or d // (4 if o2_mode == "ternary" else 8)
            combined, ck, cv = attn_dual_decode(
                q[:, :, 0], k[:, :, 0], v[:, :, 0], cs, sn, kv[0], kv[1], pos,
                mlp_hidden.reshape(b, -1), o2["packed"], rows1,
                o2["scale1"], o2["b1"], o2["scale2"], o2["b2"],
                x.reshape(b, d),
                rotary_dim=rd, clip_val=spec["out2"].clip_val, mode=o2_mode,
            )
            return combined.reshape(b, t, d), (ck, cv)
        if len(kv) == 4:
            from ternary_vllm_tpu.ops.fused_decode_attention import (
                fused_decode_attention_int8,
                fused_decode_attention_int8_tmajor,
            )

            fn = fused_decode_attention_int8_tmajor if tmajor else fused_decode_attention_int8
            attn, *new_kv_arrays = fn(
                q[:, :, 0], k[:, :, 0], v[:, :, 0], cs, sn, *kv, pos,
                rotary_dim=rd,
            )
            new_kv = tuple(new_kv_arrays)
        else:
            from ternary_vllm_tpu.ops.fused_decode_attention import (
                fused_decode_attention,
                fused_decode_attention_tmajor,
            )

            fn = fused_decode_attention_tmajor if tmajor else fused_decode_attention
            attn, ck, cv = fn(
                q[:, :, 0], k[:, :, 0], v[:, :, 0], cs, sn, kv[0], kv[1], pos,
                rotary_dim=rd,
            )
            new_kv = (ck, cv)
        attn = attn[:, :, None, :].transpose(0, 2, 1, 3).reshape(b, t, d)
        if fused:
            from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul

            o2 = p["out2"]
            o2_mode = spec["out2"].mode
            combined = dual_ternary_matmul(
                attn, mlp_hidden, o2["packed"],
                spec["out2"].rows1 or d // (4 if o2_mode == "ternary" else 8),
                o2["scale1"], o2["b1"], o2["scale2"], o2["b2"],
                clip_val=spec["out2"].clip_val, impl=spec["out2"].impl,
                a8=spec["out2"].a8, residual=x, mode=o2_mode,
            )
            return combined, new_kv
        attn = apply_linear(spec["out_proj"], p["out_proj"], attn)
        mlp = apply_linear(spec["fc1"], p["fc1"], hidden, act=config.hidden_act)
        mlp = apply_linear(spec["fc2"], p["fc2"], mlp)
        return attn + mlp + x, new_kv

    tmajor = kv is not None and cache_layout(kv, config) == "tmajor"
    if tmajor and t > 32:
        raise NotImplementedError(
            "T-major KV caches support single-token decode and small verify "
            f"windows (t <= 32), got t={t}; prefill must run on a row-major "
            "cache and convert via phi.transpose_cache"
        )

    q, k = apply_rotary(q, k, cos, sin, config.rotary_dim)

    if kv is not None and _DEBUG_SKIP_CACHE_WRITE and t == 1:
        new_kv = kv
        if len(kv) == 4:
            k_full = _dequantize_kv(kv[0], kv[1], x.dtype)
            v_full = _dequantize_kv(kv[2], kv[3], x.dtype)
        else:
            k_full, v_full = kv[0].astype(x.dtype), kv[1].astype(x.dtype)
    elif kv is not None:
        if _is_vector_pos(pos):
            # per-sequence positions (continuous batching): scatter each row
            def write(c, u, p):
                u = u.astype(c.dtype)
                if tmajor:  # new rows land as COLUMNS of the (KVH, hd, C) cache
                    return jax.vmap(
                        lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, 0, pp))
                    )(c, u.transpose(0, 1, 3, 2), p)
                return jax.vmap(
                    lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, pp, 0))
                )(c, u, p)

            def write_scale(c, u, p):  # scales are lane-major (B, KVH, 1, T)
                return jax.vmap(
                    lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, 0, pp))
                )(c, u.astype(c.dtype), p)
        else:
            def write(c, u, p=pos):
                u = u.astype(c.dtype)
                if tmajor:
                    return jax.lax.dynamic_update_slice(
                        c, u.transpose(0, 1, 3, 2), (0, 0, 0, p)
                    )
                return jax.lax.dynamic_update_slice(c, u, (0, 0, p, 0))

            def write_scale(c, u, p=pos):
                return jax.lax.dynamic_update_slice(c, u.astype(c.dtype), (0, 0, 0, p))

        if len(kv) == 4:  # int8 quantized cache
            ck, cks, cv, cvs = kv
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            if _is_vector_pos(pos):
                ck, cks = write(ck, kq, pos), write_scale(cks, ks, pos)
                cv, cvs = write(cv, vq, pos), write_scale(cvs, vs, pos)
            else:
                ck, cks = write(ck, kq), write_scale(cks, ks)
                cv, cvs = write(cv, vq), write_scale(cvs, vs)
            new_kv = (ck, cks, cv, cvs)
            if not tmajor:
                k_full = _dequantize_kv(ck, cks, x.dtype)
                v_full = _dequantize_kv(cv, cvs, x.dtype)
        else:
            ck, cv = kv
            if _is_vector_pos(pos):
                ck, cv = write(ck, k, pos), write(cv, v, pos)
            else:
                ck, cv = write(ck, k), write(cv, v)
            new_kv = (ck, cv)
            if not tmajor:
                k_full, v_full = ck.astype(x.dtype), cv.astype(x.dtype)
    else:
        new_kv = None
        k_full, v_full = k, v

    if new_kv is not None and tmajor:
        # T-major cached attention (speculative k+1 verify windows, unfused
        # single-token decode): the cache is K-transposed, the small-T chunk
        # kernel contracts it directly (ops/chunk_prefill_attention)
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            chunk_prefill_attention_tmajor,
            chunk_prefill_attention_tmajor_int8,
        )

        if len(new_kv) == 4:
            attn = chunk_prefill_attention_tmajor_int8(q, *new_kv, pos)
        else:
            attn = chunk_prefill_attention_tmajor(q, new_kv[0], new_kv[1], pos)
    elif new_kv is not None and t == 1:
        # fused length-aware decode attention: HBM reads bounded by the live
        # sequence length, not cache capacity (ops/decode_attention.py)
        from ternary_vllm_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_int8,
        )

        newest = pos if _is_vector_pos(pos) else pos + t - 1
        if len(new_kv) == 4:
            attn = decode_attention_int8(q[:, :, 0], *new_kv, newest)
        else:
            attn = decode_attention(
                q[:, :, 0], new_kv[0].astype(x.dtype), new_kv[1].astype(x.dtype), newest
            )
        attn = attn[:, :, None, :]
    elif t > 1 and pure_causal:
        # fresh-sequence prefill: blockwise flash attention over the new
        # tokens only (cache history is empty; slots beyond t are unattended)
        from ternary_vllm_tpu.ops.prefill_attention import prefill_attention

        attn = prefill_attention(q, _repeat_kv(k, h // kvh), _repeat_kv(v, h // kvh))
    elif new_kv is not None and t > 1:
        # chunk prefill at an offset (chunked long-prompt admission, suffix
        # after a cached prefix, speculative k+1-token verify windows —
        # scalar or per-slot vector positions): flash kernel over the live
        # cache prefix — reads scale with start+t, not capacity
        # (ops/chunk_prefill_attention; small T pads to the 128-row tile)
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            chunk_prefill_attention,
            chunk_prefill_attention_int8,
        )

        if len(new_kv) == 4:
            attn = chunk_prefill_attention_int8(q, *new_kv, pos)
        else:
            attn = chunk_prefill_attention(q, new_kv[0], new_kv[1], pos)
    else:
        k_full = _repeat_kv(k_full, h // kvh)
        v_full = _repeat_kv(v_full, h // kvh)
        if mask is None and kv is not None:
            # cached-path fallback (unreachable under the current dispatch —
            # every cached shape routes to a kernel above — but kept correct
            # for future dispatch changes): build the mask on demand
            mask = _causal_mask_cached(t, k_full.shape[2], pos, x.dtype)
        attn = _attention(q, k_full, v_full, mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    if fused:
        # one dual-accumulator kernel for out_proj(attn) + fc2(mlp_hidden)
        from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul

        o2 = p["out2"]
        o2_mode = spec["out2"].mode
        combined = dual_ternary_matmul(
            attn,
            mlp_hidden,
            o2["packed"],
            spec["out2"].rows1 or d // (4 if o2_mode == "ternary" else 8),
            o2["scale1"],
            o2["b1"],
            o2["scale2"],
            o2["b2"],
            clip_val=spec["out2"].clip_val,
            impl=spec["out2"].impl,
            a8=spec["out2"].a8,
            residual=x,
            mode=o2_mode,
        )
        return combined, new_kv

    attn = apply_linear(spec["out_proj"], p["out_proj"], attn)
    mlp = apply_linear(spec["fc1"], p["fc1"], hidden, act=config.hidden_act)
    mlp = apply_linear(spec["fc2"], p["fc2"], mlp)

    return attn + mlp + x, new_kv


def _is_vector_pos(pos) -> bool:
    return hasattr(pos, "ndim") and pos.ndim == 1


def _causal_mask_cached(t, cache_len, pos, dtype):
    """Additive mask: query at pos+i sees kv slots <= pos+i.

    ``pos`` scalar → (1,1,T,cache_len); ``pos`` (B,) vector (continuous
    batching, per-sequence positions) → (B,1,T,cache_len)."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (t, cache_len), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (t, cache_len), 1)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    if _is_vector_pos(pos):
        ok = kv_idx[None] <= (q_idx[None] + pos[:, None, None])
        return jnp.where(ok, 0.0, neg)[:, None].astype(jnp.float32)
    ok = kv_idx <= (q_idx + pos)
    return jnp.where(ok, 0.0, neg)[None, None].astype(jnp.float32)


def _causal_mask_full(t, attn_mask, dtype):
    """(B,1,T,T) additive mask: causal ∧ optional padding mask (B, T) of bools
    (reference ``impl/tf/attention.py:87-105``)."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    ok = (kv_idx <= q_idx)[None, None]
    if attn_mask is not None:
        ok = jnp.logical_and(ok, attn_mask[:, None, None, :].astype(bool))
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    return jnp.where(ok, 0.0, neg).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Public forward
# ---------------------------------------------------------------------------


def embed_tokens(params, input_ids):
    """Token ids → embeddings (reference ``layers.py:352-360``)."""
    return jnp.take(params["wte"], input_ids, axis=0)


def lm_head(params, hidden, config: PhiConfig):
    """Final LN + vocab projection (reference ``layers.py:363-373``).

    If the linear was converted with ``quant.quantize.quantize_linear_int8``
    (params carry ``w_q`` instead of ``w``), uses the w8a8 int8 kernel — the
    bf16 vocab projection otherwise dominates the decode step's fixed cost;
    the final LN fuses into that kernel's prologue."""
    ln = params["lm_head"]["ln"]
    lin = params["lm_head"]["linear"]
    if "w_q" in lin:
        from ternary_vllm_tpu.ops.ternary_matmul import int8_matmul

        return int8_matmul(
            hidden, lin["w_q"], lin["scale"], lin.get("b"),
            ln=(ln["scale"], ln["bias"]), ln_eps=config.layer_norm_eps,
        )
    if "w_q4p" in lin:  # int4 head (quant.quantize.quantize_lm_head_int4)
        from ternary_vllm_tpu.ops.ternary_matmul import int4_matmul

        return int4_matmul(
            hidden, lin["w_q4p"], lin["scale"], lin.get("b"),
            ln=(ln["scale"], ln["bias"]), ln_eps=config.layer_norm_eps,
        )
    h = _layer_norm(ln, hidden, config.layer_norm_eps)
    return apply_linear(DENSE, lin, h)


def forward(
    params,
    config: PhiConfig,
    specs,
    inputs_embeds,
    cache=None,
    pos=0,
    attn_mask=None,
    return_hidden: bool = False,
    remat: bool = False,
):
    """Run the decoder stack.

    Args:
      inputs_embeds: (B, T, D).
      cache: output of :func:`init_cache` (decode) or ``None`` (training /
        full-sequence forward).
      pos: scalar int — number of tokens already in the cache.
      attn_mask: optional (B, T) bool padding mask (cache=None path only).

    Returns ``(logits (B,T,V), new_cache)`` — the reference signature
    ``PhiModel.call`` (``model.py:63-105``), with fixed-shape cache.
    """
    specs = _spec_dicts(specs)
    b, t, _ = inputs_embeds.shape
    x = inputs_embeds

    if cache is not None:
        if _is_vector_pos(pos):
            positions = pos[:, None] + jnp.arange(t)[None, :]  # (B, T)
        else:
            positions = pos + jnp.arange(t)
        # the cached-path mask (B,1,T,cache_len) is consumed only by the
        # dense _attention fallback, which every cached dispatch (fused
        # decode / decode / prefill / chunk-prefill kernels) bypasses —
        # build it lazily in _decoder_layer instead of materializing a
        # multi-hundred-MB f32 tensor here and relying on XLA DCE (round-3
        # advisor: eager/debug execution paid it for real)
        mask = None
    else:
        positions = jnp.arange(t)
        mask = _causal_mask_full(t, attn_mask, x.dtype)

    cos, sin = _rope_cos_sin(positions, config.rotary_dim, config.rope_theta, jnp.float32)
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)

    # pure-causal (no padding, fresh sequence) enables the flash prefill path
    if cache is None:
        pure_causal = attn_mask is None
    else:
        pure_causal = isinstance(pos, int) and pos == 0

    new_cache = [] if cache is not None else None
    for i, (layer_p, layer_s) in enumerate(zip(params["layers"], specs)):
        kv = cache[i] if cache is not None else None
        if remat and cache is None:
            # gradient checkpointing (the analogue of the reference's
            # gradient_checkpointing_enable, train.py:220)
            layer_fn = jax.checkpoint(
                lambda p, xx, kv_=kv, s_=layer_s: _decoder_layer(
                    p, s_, config, xx, cos, sin, mask, kv_, pos, pure_causal
                )
            )
            x, new_kv = layer_fn(layer_p, x)
        else:
            x, new_kv = _decoder_layer(
                layer_p, layer_s, config, x, cos, sin, mask, kv, pos, pure_causal
            )
        if cache is not None:
            new_cache.append(new_kv)

    if return_hidden:
        return x, new_cache
    logits = lm_head(params, x, config)
    return logits, new_cache


def forward_tokens(params, config, specs, input_ids, cache=None, pos=0, attn_mask=None):
    """Convenience: ids → logits (embeds + forward)."""
    return forward(
        params, config, specs, embed_tokens(params, input_ids), cache, pos, attn_mask
    )
