"""Ring attention: sequence-sharded exact attention with K/V rotating around
the device ring (context parallelism).

Net-new vs the reference (max context 2048, no sequence parallelism —
SURVEY.md §5 "long-context: absent").  The sequence axis is sharded over the
mesh; each step every device computes blockwise online-softmax attention of
its local Q chunk against the K/V block it currently holds, then passes the
block to its ring neighbor with ``ppermute``.  After ``n`` steps every Q chunk
has seen every K/V chunk; memory per device is O(T/n), enabling contexts far
beyond single-device HBM.  Collectives are XLA ``ppermute`` riding ICI; the
communication of step i+1 overlaps step i's compute under the latency-hiding
scheduler.

Causal masking uses global positions, so the result is exactly standard
causal attention (up to f32 summation order).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = float(-1e30)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "model", causal: bool = True):
    """q/k/v: (B, H, T, hd) GLOBAL arrays with T sharded over ``axis``
    (or replicated inputs — shard_map splits them).  Returns (B, H, T, hd)."""
    b, h, t, hd = q.shape
    n = mesh.shape[axis]
    if t % n != 0:
        raise ValueError(f"T={t} not divisible by ring size {n}")
    scale = 1.0 / math.sqrt(hd)
    t_loc = t // n
    perm = [(i, (i + 1) % n) for i in range(n)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
        ),
        out_specs=P(None, None, axis, None),
    )
    def _ring(ql, kl, vl):
        my = jax.lax.axis_index(axis)
        qf = ql.astype(jnp.float32)
        q_pos = my * t_loc + jax.lax.broadcasted_iota(jnp.int32, (t_loc, t_loc), 0)

        def body(i, carry):
            kb, vb, m, l, acc = carry
            src = (my - i) % n  # rank that originally held this block
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale
            if causal:
                k_pos = src * t_loc + jax.lax.broadcasted_iota(
                    jnp.int32, (t_loc, t_loc), 1
                )
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

        # derive init carries from qf so their device-varying type matches the
        # loop outputs (shard_map VMA typing)
        m0 = qf[..., :1] * 0.0 + NEG_INF
        l0 = qf[..., :1] * 0.0
        acc0 = qf * 0.0
        _, _, _, l, acc = jax.lax.fori_loop(0, n, body, (kl, vl, m0, l0, acc0))
        # fully-masked rows (none under causal with q_pos >= 0) guard:
        out = acc / jnp.maximum(l, 1e-30)
        return out.astype(ql.dtype)

    return _ring(q, k, v)
