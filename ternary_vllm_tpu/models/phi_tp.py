"""Tensor-parallel packed decode: sharded packed weights + head-sharded KV
cache under ``shard_map`` (the BASELINE north star: "packed ternary weights
and KV-cache tensor-sharded over ICI").

Layout (Megatron pairing, byte-exact packed shards):

* Wqkv — column-parallel with the columns REGROUPED so each shard holds the
  contiguous ``[q_h | k_h | v_h]`` blocks of its own heads (a plain N-split of
  the fused [q|k|v] layout would give every shard slices of all three).
* out_proj — row-parallel; K rows follow the head-major attn output, so shard
  d's rows are exactly its heads' features; packed **per shard**
  (``parallel.tp.pack_ternary_sharded``) so each S-block is a valid planar
  packing.
* fc1 — column-parallel (plain N-split); gelu applied locally per shard.
* fc2 — row-parallel, packed per shard.
* KV cache — heads sharded; rope/attention/update all local.
* One ``psum`` per layer: the attn and MLP partial outputs are summed locally
  first (the parallel block adds them anyway), then reduced over ``model``;
  scale is per-output-channel and replicated, biases added after the psum —
  mathematically identical to the reference's per-matmul epilogue because
  row-sharding only splits the contraction.
* lm_head — vocab-sharded; greedy sampling does a tiny all-gather of per-shard
  (max, argmax) pairs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import quantized_matmul
from ternary_vllm_tpu.parallel.tp import pack_ternary_sharded


# ---------------------------------------------------------------------------
# Host-side weight re-layout
# ---------------------------------------------------------------------------


def _regroup_qkv_columns(arr, d: int, tp: int, axis: int):
    """[q|k|v] feature order -> [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] per shard."""
    per = d // tp
    sections = [jnp.take(arr, jnp.arange(s * d, (s + 1) * d), axis=axis) for s in range(3)]
    blocks = []
    for dshard in range(tp):
        for sec in sections:
            blocks.append(
                jnp.take(sec, jnp.arange(dshard * per, (dshard + 1) * per), axis=axis)
            )
    return jnp.concatenate(blocks, axis=axis)


def make_tp_packed_params(qat_params, config: phi.PhiConfig, tp: int) -> Dict[str, Any]:
    """QAT (latent) decoder params -> packed params laid out for ``tp`` shards.

    Works from latent weights so each piece can be re-packed in its sharded
    layout; returns a pytree whose quantized buffers are GLOBAL arrays that
    become correct local blocks under the standard N/S equal-split sharding."""
    from ternary_vllm_tpu.ops.quantizers import tri_step_ste

    d = config.hidden_size
    layers = []
    for layer in qat_params["layers"]:
        def w_of(p):
            return tri_step_ste(p["latent"])

        wqkv, outp, fc1, fc2 = layer["wqkv"], layer["out_proj"], layer["fc1"], layer["fc2"]
        layers.append(
            {
                "ln": layer["ln"],
                "wqkv": {
                    "packed": pack_ternary(_regroup_qkv_columns(w_of(wqkv), d, tp, 1)),
                    "scale": _regroup_qkv_columns(wqkv["scale"], d, tp, 0),
                    "b": _regroup_qkv_columns(wqkv["b"], d, tp, 0),
                },
                "out_proj": {
                    "packed": pack_ternary_sharded(w_of(outp), tp),
                    "scale": outp["scale"],
                    "b": outp["b"],
                },
                "fc1": {
                    "packed": pack_ternary(w_of(fc1)),
                    "scale": fc1["scale"],
                    "b": fc1["b"],
                },
                "fc2": {
                    "packed": pack_ternary_sharded(w_of(fc2), tp),
                    "scale": fc2["scale"],
                    "b": fc2["b"],
                },
            }
        )
    return {"wte": qat_params["wte"], "layers": layers, "lm_head": qat_params["lm_head"]}


def tp_param_specs(params) -> Dict[str, Any]:
    """PartitionSpecs matching :func:`make_tp_packed_params` output."""
    layers = []
    for _ in params["layers"]:
        layers.append(
            {
                "ln": {"scale": P(), "bias": P()},
                "wqkv": {"packed": P(None, "model"), "scale": P("model"), "b": P("model")},
                "out_proj": {"packed": P("model", None), "scale": P(), "b": P()},
                "fc1": {"packed": P(None, "model"), "scale": P("model"), "b": P("model")},
                "fc2": {"packed": P("model", None), "scale": P(), "b": P()},
            }
        )
    return {
        "wte": P(),
        "layers": layers,
        "lm_head": {
            "ln": {"scale": P(), "bias": P()},
            "linear": {"w": P(None, "model"), "b": P("model")},
        },
    }


def shard_tp_params(params, mesh: Mesh):
    specs = tp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P),
    )


def tp_cache_specs(cache):
    return [tuple(P(None, "model", None, None) for _ in kv) for kv in cache]


def shard_tp_cache(cache, mesh: Mesh):
    specs = tp_cache_specs(cache)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, specs, is_leaf=lambda x: isinstance(x, P),
    )


# ---------------------------------------------------------------------------
# The sharded decode step
# ---------------------------------------------------------------------------


def _local_layer(p, config, x, cos, sin, kv, pos, h_loc, clip_val, axis, a8=False):
    """Per-shard layer body: local heads + partial row-parallel outputs,
    ONE psum.  ``a8`` selects the int8-activation (w2a8) kernel per shard —
    activations are quantized locally per row; row-parallel partials stay
    exact in int32 before dequantization, so the psum semantics are
    unchanged."""
    b, t, d = x.shape
    hd = config.head_dim

    # LN feeds both Wqkv and fc1; fuse it into each kernel's prologue (the
    # duplicated LN compute is row-sized — negligible — while the saved XLA
    # dispatch per layer is not, at decode)
    ln = (p["ln"]["scale"], p["ln"]["bias"])
    qkv = quantized_matmul(
        x, p["wqkv"]["packed"], mode="ternary",
        scale=p["wqkv"]["scale"], bias=p["wqkv"]["b"], clip_val=clip_val,
        a8=a8, ln=ln, ln_eps=config.layer_norm_eps,
    )
    # local layout: [q_loc | k_loc | v_loc] of this shard's heads
    dl = h_loc * hd
    q, k, v = qkv[..., :dl], qkv[..., dl : 2 * dl], qkv[..., 2 * dl :]
    q = q.reshape(b, t, h_loc, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h_loc, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h_loc, hd).transpose(0, 2, 1, 3)
    q, k = phi.apply_rotary(q, k, cos, sin, config.rotary_dim)

    ck, cv = kv
    ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, pos, 0))
    cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, pos, 0))

    if t == 1:
        from ternary_vllm_tpu.ops.decode_attention import decode_attention

        attn = decode_attention(q[:, :, 0], ck.astype(x.dtype), cv.astype(x.dtype), pos)
        attn = attn[:, :, None, :]
    else:
        cache_len = ck.shape[2]
        mask = phi._causal_mask_cached(t, cache_len, pos, x.dtype)
        attn = phi._attention(q, ck.astype(x.dtype), cv.astype(x.dtype), mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, dl)

    # row-parallel partials, NO bias/clip yet (they apply post-reduction)
    attn_part = quantized_matmul(
        attn, p["out_proj"]["packed"], mode="ternary", clip_val=None, a8=a8
    )
    mlp_h = quantized_matmul(
        x, p["fc1"]["packed"], mode="ternary",
        scale=p["fc1"]["scale"], bias=p["fc1"]["b"], clip_val=clip_val,
        act=config.hidden_act, a8=a8, ln=ln, ln_eps=config.layer_norm_eps,
    )
    mlp_part = quantized_matmul(
        mlp_h, p["fc2"]["packed"], mode="ternary", clip_val=None, a8=a8
    )

    attn_full = jax.lax.psum(attn_part, axis)
    mlp_full = jax.lax.psum(mlp_part, axis)

    def finish(y, scale, bias):
        y = y.astype(jnp.float32) * scale + bias
        if clip_val is not None:
            y = jnp.clip(y, -abs(clip_val), abs(clip_val))
        return y.astype(x.dtype)

    attn_o = finish(attn_full, p["out_proj"]["scale"], p["out_proj"]["b"])
    mlp_o = finish(mlp_full, p["fc2"]["scale"], p["fc2"]["b"])
    return attn_o + mlp_o + x, (ck, cv)


def make_tp_decode_step(
    config: phi.PhiConfig,
    mesh: Mesh,
    clip_val: float = 100.0,
    axis: str = "model",
    a8: bool = False,
):
    """Build a jitted sharded step: (params, cache, embeds, pos) ->
    (logits, cache).  ``embeds`` (B, T, D) replicated; cache head-sharded.
    ``a8=True`` runs every packed matmul through the int8-activation (w2a8)
    kernel."""
    tp = mesh.shape[axis]
    h_loc = config.num_attention_heads // tp

    def step(params, cache, embeds, pos):
        b, t, _ = embeds.shape
        positions = pos + jnp.arange(t)
        cos, sin = phi._rope_cos_sin(positions, config.rotary_dim, config.rope_theta, jnp.float32)
        cos = cos.astype(embeds.dtype)
        sin = sin.astype(embeds.dtype)
        x = embeds
        new_cache = []
        for p, kv in zip(params["layers"], cache):
            x, nkv = _local_layer(p, config, x, cos, sin, kv, pos, h_loc, clip_val, axis, a8)
            new_cache.append(nkv)
        hidden = phi._layer_norm(params["lm_head"]["ln"], x, config.layer_norm_eps)
        logits_loc = (
            jnp.dot(hidden, params["lm_head"]["linear"]["w"], preferred_element_type=jnp.float32)
            + params["lm_head"]["linear"]["b"]
        )
        return logits_loc.astype(x.dtype), new_cache

    def cache_spec_tree(cache):
        return [tuple(P(None, axis, None, None) for _ in kv) for kv in cache]

    @partial(jax.jit, static_argnames=(), donate_argnums=(1,))
    def wrapped(params, cache, embeds, pos):
        in_specs = (
            tp_param_specs(params),
            cache_spec_tree(cache),
            P(),
            P(),
        )
        out_specs = (P(None, None, axis), cache_spec_tree(cache))
        fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
        return fn(params, cache, embeds, pos)

    return wrapped


def tp_greedy_token(logits_sharded, mesh: Mesh, axis: str = "model"):
    """Global argmax over vocab-sharded logits (B, V) [sharded on V]."""
    tp = mesh.shape[axis]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis),), out_specs=P(None),
        check_vma=False,  # all_gather+reduce makes the result replicated
    )
    def _argmax(logits_loc):
        v_loc = logits_loc.shape[-1]
        local_idx = jnp.argmax(logits_loc, axis=-1)
        local_max = jnp.max(logits_loc, axis=-1)
        shard = jax.lax.axis_index(axis)
        cand_max = jax.lax.all_gather(local_max, axis)  # (tp, B)
        cand_idx = jax.lax.all_gather(local_idx + shard * v_loc, axis)
        best = jnp.argmax(cand_max, axis=0)  # (B,)
        return jnp.take_along_axis(cand_idx, best[None, :], axis=0)[0].astype(jnp.int32)

    return _argmax(logits_sharded)
