"""Tensor-parallel packed Phi: sharded packed weights + head-sharded KV cache
under ``shard_map`` (the BASELINE north star: "packed ternary weights and
KV-cache tensor-sharded over ICI").

This path mirrors the single-chip decode kernels per shard (VERDICT r1 §weak-2
closed): the fused-LN [Wqkv|fc1] in_proj kernel, the one-dispatch fused
rope+KV-write+flash-attention decode kernel (bf16 and int8 caches), int8-
activation (w2a8) matmuls, and the int8 (w8a8) vocab-sharded lm_head.

Layout (Megatron pairing, byte-exact packed shards):

* in_proj — column-parallel ``[Wqkv | fc1]``, columns GROUPED PER SHARD:
  shard ``s`` holds ``[q_s | k_s | v_s | fc1_s]`` contiguously, so the plain
  equal N-split of the global buffer is each shard's own fused block and the
  kernel's ``act_split`` (gelu on the fc1 half) lands at ``3d/tp`` locally.
* out_proj — row-parallel; K rows follow the head-major attn output, so shard
  s's rows are exactly its heads' features; packed **per shard**
  (``parallel.tp.pack_ternary_sharded``) so each S-block is a valid planar
  packing.
* fc2 — row-parallel, packed per shard.
* KV cache — heads sharded (codes AND int8 scales); rope/attention/update all
  local, via the same fused Pallas kernels as the single-chip path.
* ONE ``psum`` per layer: the out_proj and fc2 partials (with their
  per-output-channel scales already applied in-kernel — scaling distributes
  over the reduction) are stacked and reduced together; bias and ±clip apply
  per branch AFTER the psum, keeping the reference's per-Linear
  ``clip(matmul·scale + bias)`` semantics exact under row sharding.
* lm_head — vocab-sharded int8 (w8a8) with the final LN fused into the kernel
  prologue; greedy sampling does a tiny all-gather of per-shard (max, argmax)
  pairs (:func:`tp_greedy_token`), or XLA assembles the global logits under
  GSPMD for full sampling.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.ops.packing import pack_ternary, unpack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import int8_matmul, quantized_matmul
from ternary_vllm_tpu.parallel.tp import pack_ternary_sharded


# ---------------------------------------------------------------------------
# Host-side weight re-layout
# ---------------------------------------------------------------------------


def _regroup_qkv_columns(arr, widths, tp: int, axis: int):
    """[q|k|v] feature order -> [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] per shard.

    ``widths``: (q_width, k_width, v_width) — equal for MHA, smaller K/V
    thirds under GQA (head-sharded: shard s gets heads block s of each
    section, so each must divide evenly by tp)."""
    offs = [0]
    for w in widths:
        offs.append(offs[-1] + w)
    sections = [
        jnp.take(arr, jnp.arange(offs[i], offs[i + 1]), axis=axis) for i in range(3)
    ]
    blocks = []
    for dshard in range(tp):
        for sec, w in zip(sections, widths):
            per = w // tp
            blocks.append(
                jnp.take(sec, jnp.arange(dshard * per, (dshard + 1) * per), axis=axis)
            )
    return jnp.concatenate(blocks, axis=axis)


def _group_in_proj(wqkv_cols, fc1_cols, widths, f: int, tp: int, axis: int):
    """Interleave per-shard column blocks: shard s gets
    ``[qkv-regrouped block s | fc1 block s]`` so the global concat splits
    evenly into self-contained fused blocks under N-sharding."""
    qkv_re = _regroup_qkv_columns(wqkv_cols, widths, tp, axis)
    dl3, fl = sum(widths) // tp, f // tp
    blocks = []
    for s in range(tp):
        blocks.append(jnp.take(qkv_re, jnp.arange(s * dl3, (s + 1) * dl3), axis=axis))
        blocks.append(jnp.take(fc1_cols, jnp.arange(s * fl, (s + 1) * fl), axis=axis))
    return jnp.concatenate(blocks, axis=axis)


def _repack_rows_sharded(packed, k: int, tp: int):
    """Row-parallel repack: planar packing interleaves K-planes, so a packed
    buffer cannot be row-sliced — unpack to the true K, then pack each K-chunk
    independently (each shard's S-block becomes a valid local packing)."""
    w = unpack_ternary(packed, packed.shape[0] * 4)[:k]
    return pack_ternary_sharded(w, tp)


def tp_relayout_packed_params(
    packed_params, config: phi.PhiConfig, tp: int, int8_head: bool = True
) -> Dict[str, Any]:
    """Standard packed decoder params (``quant.quantize.pack_decoder_params``
    layout, q2 ternary) → TP-layout params for ``tp`` shards.

    Returns a pytree whose buffers are GLOBAL arrays that become correct local
    blocks under :func:`tp_param_specs`' equal-split shardings."""
    h, kvh, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim
    if h % tp or kvh % tp:
        raise ValueError(
            f"TP head sharding needs heads % tp == 0 and kv_heads % tp == 0, "
            f"got h={h}, kvh={kvh}, tp={tp}"
        )
    qkv_widths = (h * hd, kvh * hd, kvh * hd)
    d, f = config.hidden_size, config.intermediate_size
    layers = []
    for layer in packed_params["layers"]:
        if "wqkv" not in layer or "packed" not in layer["wqkv"]:
            raise NotImplementedError(
                "TP serving requires fully packed ternary layers (no dense/"
                "skipped/fused blocks) — repack with pack_decoder_params"
            )
        wqkv, fc1 = layer["wqkv"], layer["fc1"]
        outp, fc2 = layer["out_proj"], layer["fc2"]
        layers.append(
            {
                "ln": layer["ln"],
                "in_proj": {
                    # packed buffers are packed along K; columns (N) permute freely
                    "packed": _group_in_proj(wqkv["packed"], fc1["packed"], qkv_widths, f, tp, 1),
                    "scale": _group_in_proj(wqkv["scale"], fc1["scale"], qkv_widths, f, tp, 0),
                    "b": _group_in_proj(wqkv["b"], fc1["b"], qkv_widths, f, tp, 0),
                },
                "out_proj": {
                    "packed": _repack_rows_sharded(outp["packed"], d, tp),
                    "scale": outp["scale"],
                    "b": outp["b"],
                },
                "fc2": {
                    "packed": _repack_rows_sharded(fc2["packed"], f, tp),
                    "scale": fc2["scale"],
                    "b": fc2["b"],
                },
            }
        )
    lm = packed_params["lm_head"]
    lin = lm["linear"]
    if int8_head and "w" in lin:
        from ternary_vllm_tpu.quant.quantize import quantize_linear_int8

        lin = quantize_linear_int8(lin)
    return {
        "wte": packed_params["wte"],
        "layers": layers,
        "lm_head": {"ln": lm["ln"], "linear": lin},
    }


def make_tp_packed_params(
    qat_params, config: phi.PhiConfig, tp: int, int8_head: bool = True
) -> Dict[str, Any]:
    """QAT (latent) decoder params -> TP-layout packed params (convenience:
    hard-ternarize each latent, pack, then :func:`tp_relayout_packed_params`)."""
    from ternary_vllm_tpu.ops.quantizers import tri_step_ste

    def pack_one(p):
        return {
            "packed": pack_ternary(tri_step_ste(p["latent"])),
            "scale": p["scale"],
            "b": p["b"],
        }

    std = {
        "wte": qat_params["wte"],
        "layers": [
            {
                "ln": layer["ln"],
                "wqkv": pack_one(layer["wqkv"]),
                "out_proj": pack_one(layer["out_proj"]),
                "fc1": pack_one(layer["fc1"]),
                "fc2": pack_one(layer["fc2"]),
            }
            for layer in qat_params["layers"]
        ],
        "lm_head": qat_params["lm_head"],
    }
    return tp_relayout_packed_params(std, config, tp, int8_head=int8_head)


def tp_param_specs(params, axis: str = "model") -> Dict[str, Any]:
    """PartitionSpecs matching :func:`tp_relayout_packed_params` output."""
    layers = []
    for _ in params["layers"]:
        layers.append(
            {
                "ln": {"scale": P(), "bias": P()},
                "in_proj": {"packed": P(None, axis), "scale": P(axis), "b": P(axis)},
                "out_proj": {"packed": P(axis, None), "scale": P(), "b": P()},
                "fc2": {"packed": P(axis, None), "scale": P(), "b": P()},
            }
        )
    lin = params["lm_head"]["linear"]
    if "w_q" in lin:
        lin_spec = {"w_q": P(None, axis), "scale": P(axis), "b": P(axis)}
    elif "w_q4p" in lin:
        lin_spec = {"w_q4p": P(None, axis), "scale": P(axis), "b": P(axis)}
    else:
        lin_spec = {"w": P(None, axis), "b": P(axis)}
    lin_spec = {k: v for k, v in lin_spec.items() if k in lin}
    return {
        "wte": P(),
        "layers": layers,
        "lm_head": {"ln": {"scale": P(), "bias": P()}, "linear": lin_spec},
    }


def shard_tp_params(params, mesh: Mesh, axis: str = "model"):
    specs = tp_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P),
    )


def tp_cache_specs(cache, axis: str = "model"):
    return [tuple(P(None, axis, None, None) for _ in kv) for kv in cache]


def shard_tp_cache(cache, mesh: Mesh, axis: str = "model"):
    specs = tp_cache_specs(cache, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, specs, is_leaf=lambda x: isinstance(x, P),
    )


# ---------------------------------------------------------------------------
# The sharded forward (prefill + decode, bf16 / int8 caches, vector positions)
# ---------------------------------------------------------------------------


def _tp_layer(p, config, x, cos, sin, kv, pos, tp, clip_val, axis, a8):
    """Per-shard parallel block with the single-chip decode kernels:
    fused-LN in_proj, fused rope+write+attention at t==1, per-branch-scale
    row-parallel partials, ONE stacked psum, post-psum bias/clip."""
    b, t, d = x.shape
    hd = config.head_dim
    h_loc = config.num_attention_heads // tp
    kvh_loc = config.num_key_value_heads // tp
    dl = h_loc * hd
    kvdl = kvh_loc * hd
    dl3 = dl + 2 * kvdl  # GQA: K/V thirds are kvh_loc heads wide

    both = quantized_matmul(
        x, p["in_proj"]["packed"], mode="ternary",
        scale=p["in_proj"]["scale"], bias=p["in_proj"]["b"], clip_val=clip_val,
        act=config.hidden_act, act_split=dl3, a8=a8,
        ln=(p["ln"]["scale"], p["ln"]["bias"]), ln_eps=config.layer_norm_eps,
    )
    qkv, mlp_hidden = both[..., :dl3], both[..., dl3:]
    q = qkv[..., :dl].reshape(b, t, h_loc, hd).transpose(0, 2, 1, 3)
    k = qkv[..., dl : dl + kvdl].reshape(b, t, kvh_loc, hd).transpose(0, 2, 1, 3)
    v = qkv[..., dl + kvdl :].reshape(b, t, kvh_loc, hd).transpose(0, 2, 1, 3)

    rd = config.rotary_dim
    if kv is not None and t == 1:
        # single-dispatch fused rope + (quantized) cache write + attention —
        # all head-local, so the single-chip kernels run unchanged per shard
        cs = jnp.broadcast_to(cos.reshape(-1, rd), (b, rd))
        sn = jnp.broadcast_to(sin.reshape(-1, rd), (b, rd))
        if len(kv) == 4:
            from ternary_vllm_tpu.ops.fused_decode_attention import (
                fused_decode_attention_int8,
            )

            attn, *new_kv_arrays = fused_decode_attention_int8(
                q[:, :, 0], k[:, :, 0], v[:, :, 0], cs, sn, *kv, pos, rotary_dim=rd
            )
            new_kv = tuple(new_kv_arrays)
        else:
            from ternary_vllm_tpu.ops.fused_decode_attention import (
                fused_decode_attention,
            )

            attn, ck, cv = fused_decode_attention(
                q[:, :, 0], k[:, :, 0], v[:, :, 0], cs, sn, kv[0], kv[1], pos,
                rotary_dim=rd,
            )
            new_kv = (ck, cv)
        attn = attn[:, :, None, :]  # (b, h_loc, 1, hd)
    else:
        q, k = phi.apply_rotary(q, k, cos, sin, rd)
        if kv is not None:
            if phi._is_vector_pos(pos):
                def write(c, u, pp):
                    return jax.vmap(
                        lambda cc, uu, qq: jax.lax.dynamic_update_slice(cc, uu, (0, qq, 0))
                    )(c, u.astype(c.dtype), pp)

                def write_scale(c, u, pp):
                    return jax.vmap(
                        lambda cc, uu, qq: jax.lax.dynamic_update_slice(cc, uu, (0, 0, qq))
                    )(c, u.astype(c.dtype), pp)
            else:
                def write(c, u, pp=pos):
                    return jax.lax.dynamic_update_slice(c, u.astype(c.dtype), (0, 0, pp, 0))

                def write_scale(c, u, pp=pos):
                    return jax.lax.dynamic_update_slice(c, u.astype(c.dtype), (0, 0, 0, pp))

            if len(kv) == 4:
                ck, cks, cv, cvs = kv
                kq, ks = phi._quantize_kv(k)
                vq, vs = phi._quantize_kv(v)
                if phi._is_vector_pos(pos):
                    ck, cks = write(ck, kq, pos), write_scale(cks, ks, pos)
                    cv, cvs = write(cv, vq, pos), write_scale(cvs, vs, pos)
                else:
                    ck, cks = write(ck, kq), write_scale(cks, ks)
                    cv, cvs = write(cv, vq), write_scale(cvs, vs)
                new_kv = (ck, cks, cv, cvs)
                k_full = phi._dequantize_kv(ck, cks, x.dtype)
                v_full = phi._dequantize_kv(cv, cvs, x.dtype)
            else:
                ck, cv = kv
                if phi._is_vector_pos(pos):
                    ck, cv = write(ck, k, pos), write(cv, v, pos)
                else:
                    ck, cv = write(ck, k), write(cv, v)
                new_kv = (ck, cv)
                k_full, v_full = ck.astype(x.dtype), cv.astype(x.dtype)
            cache_len = k_full.shape[2]
            mask = phi._causal_mask_cached(t, cache_len, pos, x.dtype)
        else:
            new_kv = None
            k_full, v_full = k, v
            mask = phi._causal_mask_full(t, None, x.dtype)
        groups = h_loc // kvh_loc
        attn = phi._attention(
            q, phi._repeat_kv(k_full, groups), phi._repeat_kv(v_full, groups), mask
        )

    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, dl)

    # row-parallel partials with the per-output-channel SCALE applied
    # in-kernel (it distributes over the reduction); bias/clip post-psum
    attn_part = quantized_matmul(
        attn, p["out_proj"]["packed"], mode="ternary",
        scale=p["out_proj"]["scale"], bias=None, clip_val=None, a8=a8,
    )
    mlp_part = quantized_matmul(
        mlp_hidden, p["fc2"]["packed"], mode="ternary",
        scale=p["fc2"]["scale"], bias=None, clip_val=None, a8=a8,
    )
    parts = jax.lax.psum(jnp.stack([attn_part, mlp_part]), axis)

    def finish(y, bias):
        y = y.astype(jnp.float32) + bias.astype(jnp.float32)
        if clip_val is not None:
            y = jnp.clip(y, -abs(clip_val), abs(clip_val))
        return y.astype(x.dtype)

    out = finish(parts[0], p["out_proj"]["b"]) + finish(parts[1], p["fc2"]["b"]) + x
    return out, new_kv


def _tp_lm_head(params, config, x):
    ln = params["lm_head"]["ln"]
    lin = params["lm_head"]["linear"]
    if "w_q" in lin:
        return int8_matmul(
            x, lin["w_q"], lin["scale"], lin.get("b"),
            ln=(ln["scale"], ln["bias"]), ln_eps=config.layer_norm_eps,
        )
    if "w_q4p" in lin:
        from ternary_vllm_tpu.ops.ternary_matmul import int4_matmul

        return int4_matmul(
            x, lin["w_q4p"], lin["scale"], lin.get("b"),
            ln=(ln["scale"], ln["bias"]), ln_eps=config.layer_norm_eps,
        )
    h = phi._layer_norm(ln, x, config.layer_norm_eps)
    y = jnp.dot(h, lin["w"], preferred_element_type=jnp.float32) + lin["b"]
    return y.astype(x.dtype)


def tp_forward(
    params,
    config: phi.PhiConfig,
    embeds,
    cache,
    pos,
    *,
    mesh: Mesh,
    axis: str = "model",
    a8: bool = False,
    clip_val: Optional[float] = 100.0,
):
    """Sharded forward: (params TP-layout, embeds replicated, cache
    head-sharded, pos scalar or per-row vector) -> (logits vocab-sharded,
    new cache).  Same contract as :func:`phi.forward` restricted to the
    cache path — prefill (t>1) and decode (t==1) both supported, bf16 tuple
    or int8 4-tuple caches, per-slot vector positions for continuous
    batching."""
    tp = mesh.shape[axis]

    def step(params, cache, embeds, pos):
        b, t, _ = embeds.shape
        if phi._is_vector_pos(pos):
            positions = pos[:, None] + jnp.arange(t)[None, :]
        else:
            positions = pos + jnp.arange(t)
        cos, sin = phi._rope_cos_sin(
            positions, config.rotary_dim, config.rope_theta, jnp.float32
        )
        cos = cos.astype(embeds.dtype)
        sin = sin.astype(embeds.dtype)
        x = embeds
        new_cache = []
        for p, kv in zip(params["layers"], cache):
            x, nkv = _tp_layer(p, config, x, cos, sin, kv, pos, tp, clip_val, axis, a8)
            new_cache.append(nkv)
        return _tp_lm_head(params, config, x), new_cache

    cache_in = tp_cache_specs(cache, axis)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(tp_param_specs(params, axis), cache_in, P(), P()),
        out_specs=(P(None, None, axis), cache_in),
    )
    return fn(params, cache, embeds, pos)


def make_tp_decode_step(
    config: phi.PhiConfig,
    mesh: Mesh,
    clip_val: Optional[float] = 100.0,
    axis: str = "model",
    a8: bool = False,
):
    """Build a jitted sharded step: (params, cache, embeds, pos) ->
    (logits, cache).  ``embeds`` (B, T, D) replicated; cache head-sharded."""

    @partial(jax.jit, donate_argnums=(1,))
    def wrapped(params, cache, embeds, pos):
        return tp_forward(
            params, config, embeds, cache, pos,
            mesh=mesh, axis=axis, a8=a8, clip_val=clip_val,
        )

    return wrapped


def tp_greedy_token(logits_sharded, mesh: Mesh, axis: str = "model"):
    """Global argmax over vocab-sharded logits (B, V) [sharded on V]."""

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
