"""Sequence-parallel prefill: ring attention integrated into the decoder.

Long-context capability (VERDICT r1 item 7; SURVEY.md §5 "long-context:
absent" — the reference caps context at 2048, ``layers.py:393``).  The prompt
is sharded along the SEQUENCE axis over the mesh: every matmul in the stack
is position-independent, so each device runs the packed kernels on its own
T/n slice with replicated weights, while attention runs as ring attention —
K/V blocks rotate around the device ring via ``ppermute`` so each Q chunk
sees every earlier position without any device ever holding the full
sequence.  Activation memory per device is O(T/n): prompts far beyond one
chip's HBM prefill exactly (not approximately — causal masking uses global
positions).

Composition: ``sp_prefill`` returns the per-layer K/V for the WHOLE prompt
(sequence-sharded); ``sp_prefill_to_cache`` scatters them into a fixed-
capacity decode cache, which then serves single-chip decode or head-sharded
TP decode (``models/phi_tp``) — the "sequence-sharded prefill → head-sharded
decode" pipeline.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ternary_vllm_tpu.models import phi

NEG_INF = float(-1e30)


def _ring_attention_local(ql, kl, vl, axis: str, n: int, causal: bool = True):
    """Ring attention body for use INSIDE an enclosing shard_map.

    ql/kl/vl: (B, H, T_loc, hd) — this device's sequence chunk.  Returns the
    local attention output (B, H, T_loc, hd).  Same math as
    :func:`ternary_vllm_tpu.parallel.ring_attention.ring_attention`."""
    t_loc = ql.shape[2]
    hd = ql.shape[3]
    scale = 1.0 / math.sqrt(hd)
    perm = [(i, (i + 1) % n) for i in range(n)]
    my = jax.lax.axis_index(axis)
    qf = ql.astype(jnp.float32)
    q_pos = my * t_loc + jax.lax.broadcasted_iota(jnp.int32, (t_loc, t_loc), 0)

    def body(i, carry):
        kb, vb, m, l, acc = carry
        src = (my - i) % n
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            k_pos = src * t_loc + jax.lax.broadcasted_iota(jnp.int32, (t_loc, t_loc), 1)
            ok = k_pos <= q_pos
            logits = jnp.where(ok[None, None], logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr + pv
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        return kb, vb, m_new, l, acc

    m0 = qf[..., :1] * 0.0 + NEG_INF
    l0 = qf[..., :1] * 0.0
    acc0 = qf * 0.0
    _, _, _, l, acc = jax.lax.fori_loop(0, n, body, (kl, vl, m0, l0, acc0))
    return (acc / jnp.maximum(l, 1e-30)).astype(ql.dtype)


def sp_prefill(
    params, config: phi.PhiConfig, specs, embeds, mesh: Mesh, axis: str = "model"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequence-sharded full prefill.

    Args:
      embeds: (B, T, D) with T divisible by the ring size (pad the prompt to
        a multiple on the host).  Weights are replicated; activations live
        sequence-sharded.
      specs: UNFUSED per-layer LinearSpecs (``phi.layer_specs`` /
        ``pack_decoder_params`` layout).

    Returns ``(logits (B, T, V), ks, vs)`` where ks/vs are
    ``(L, B, KVH, T, hd)`` — per-layer rope'd K/V of the whole prompt, all
    sequence-sharded over ``axis``.
    """
    spec_dicts = phi._spec_dicts(phi.freeze_specs(specs))
    if any("in_proj" in spec for spec in spec_dicts):
        # flagship fused layout: relayout fused->unfused at the prefill
        # boundary (pure plane slicing, numerics identical) — ring attention
        # needs per-matmul access to Wqkv, but callers keep ONE param set
        from ternary_vllm_tpu.quant.quantize import unfuse_packed_decoder_params

        params, specs = unfuse_packed_decoder_params(params, spec_dicts, config)
        spec_dicts = phi._spec_dicts(phi.freeze_specs(specs))
    b, t, d = embeds.shape
    n = mesh.shape[axis]
    if t % n != 0:
        raise ValueError(f"T={t} not divisible by ring size {n}")
    t_loc = t // n
    h, hd = config.num_attention_heads, config.head_dim
    kvh = config.num_key_value_heads

    def step(params, x):
        my = jax.lax.axis_index(axis)
        positions = my * t_loc + jnp.arange(t_loc)
        cos, sin = phi._rope_cos_sin(
            positions, config.rotary_dim, config.rope_theta, jnp.float32
        )
        cos = cos.astype(x.dtype)
        sin = sin.astype(x.dtype)
        ks_out, vs_out = [], []
        for p, spec in zip(params["layers"], spec_dicts):
            hidden = phi._layer_norm(p["ln"], x, config.layer_norm_eps)
            qkv = phi.apply_linear(spec["wqkv"], p["wqkv"], hidden)
            # GQA split: h query heads, then kvh K heads, then kvh V heads
            qd, kvd = h * hd, kvh * hd
            q, k, v = qkv[..., :qd], qkv[..., qd : qd + kvd], qkv[..., qd + kvd :]
            q = q.reshape(b, t_loc, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, t_loc, kvh, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, t_loc, kvh, hd).transpose(0, 2, 1, 3)
            q, k = phi.apply_rotary(q, k, cos, sin, config.rotary_dim)
            groups = h // kvh
            attn = _ring_attention_local(
                q, phi._repeat_kv(k, groups), phi._repeat_kv(v, groups), axis, n
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(b, t_loc, d)
            attn = phi.apply_linear(spec["out_proj"], p["out_proj"], attn)
            mlp = phi.apply_linear(spec["fc1"], p["fc1"], hidden, act=config.hidden_act)
            mlp = phi.apply_linear(spec["fc2"], p["fc2"], mlp)
            x = attn + mlp + x
            ks_out.append(k)
            vs_out.append(v)
        logits = phi.lm_head(params, x, config)
        return logits, jnp.stack(ks_out), jnp.stack(vs_out)

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=(
            P(None, axis, None),
            P(None, None, None, axis, None),
            P(None, None, None, axis, None),
        ),
        check_vma=False,  # replicated params feed device-varying activations
    )
    return fn(params, embeds)


def sp_prefill_to_cache(
    params, config: phi.PhiConfig, specs, embeds, mesh: Mesh,
    max_len: int, axis: str = "model", cache_dtype=jnp.bfloat16,
):
    """Ring prefill + scatter into a fixed-capacity decode cache.

    Returns ``(last_logits (B, V), cache, t)`` — cache rows ``[0, T)`` hold
    the prompt's K/V; decode continues at ``pos = T`` on any backend
    (single-chip :func:`phi.forward` or head-sharded
    :func:`phi_tp.tp_forward` after :func:`phi_tp.shard_tp_cache`)."""
    b, t, _ = embeds.shape
    if t > max_len:
        raise ValueError(f"prompt length {t} exceeds cache capacity {max_len}")
    logits, ks, vs = sp_prefill(params, config, specs, embeds, mesh, axis)
    cache = phi.init_cache(config, b, max_len, cache_dtype)
    new_cache = []
    for i, kv in enumerate(cache):
        if len(kv) == 4:
            kq, ksc = phi._quantize_kv(ks[i].astype(jnp.float32))
            vq, vsc = phi._quantize_kv(vs[i].astype(jnp.float32))
            ck = jax.lax.dynamic_update_slice(kv[0], kq, (0, 0, 0, 0))
            cks = jax.lax.dynamic_update_slice(kv[1], ksc.astype(kv[1].dtype), (0, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(kv[2], vq, (0, 0, 0, 0))
            cvs = jax.lax.dynamic_update_slice(kv[3], vsc.astype(kv[3].dtype), (0, 0, 0, 0))
            new_cache.append((ck, cks, cv, cvs))
        else:
            ck = jax.lax.dynamic_update_slice(kv[0], ks[i].astype(kv[0].dtype), (0, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(kv[1], vs[i].astype(kv[1].dtype), (0, 0, 0, 0))
            new_cache.append((ck, cv))
    return logits[:, -1], new_cache, t
