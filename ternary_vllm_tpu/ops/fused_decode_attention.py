"""Fully-fused decode-step attention: RoPE + KV-cache write + flash attention
in ONE Pallas kernel per layer.

Motivation (docs/DESIGN.md §6 profile): at batch-1 decode the packed matmuls
run at the HBM wall, and the remaining ~300 µs/step is attention-path fixed
cost — per-layer rope/transpose XLA glue, two ``dynamic_update_slice`` cache
writes (~1.1 µs each × 48), and the attention kernel dispatch.  This kernel
replaces all of it with one dispatch per layer:

* **RoPE in-kernel**: raw q / k_new arrive unrotated; per-row cos/sin for the
  current position are tiny operands, rotation happens once into VMEM scratch.
* **Online-softmax flash attention** over the live cache prefix only —
  the same scalar-prefetch + block-index-clamping trick as
  :mod:`ternary_vllm_tpu.ops.decode_attention` (reads scale with true length).
* **The new token's K/V never round-trips HBM**: its logit and value enter
  the online-softmax update directly from registers at the last live chunk,
  so attention does not depend on the cache write having happened.
* **Cache write via input/output aliasing**: the block holding slot ``pos``
  is copied through VMEM with the new row selected in (a full-block
  ``where`` — no dynamic sublane stores), and written back ONCE (the output
  index map is constant across the chunk grid, so Pallas flushes a single
  block per row).  The rest of the cache is aliased, not copied.

Numerics match the unfused path (rope → dynamic_update_slice → masked
softmax) to f32 accumulation order; the XLA fallback below is used off-TPU
and keeps bit-compatible semantics for tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)


def _rope_2d(x, cos, sin, rotary_dim):
    """x: (heads, hd) f32; cos/sin: (1, rotary_dim) f32."""
    xr, xp = x[:, :rotary_dim], x[:, rotary_dim:]
    half = rotary_dim // 2
    rot = jnp.concatenate([-xr[:, half:], xr[:, :half]], axis=1)
    return jnp.concatenate([xr * cos + rot * sin, xp], axis=1)


def _fused_kernel(
    pos_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref, kc_ref, vc_ref,
    o_ref, ko_ref, vo_ref, m_ref, l_ref, acc_ref, qs_ref, ks_ref,
    *, chunk, groups, scale, rotary_dim,
):
    bi = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[bi]
    last = pos // chunk

    @pl.when(c == 0)
    def _():
        cos = cos_ref[:].astype(jnp.float32)  # (1, rd)
        sin = sin_ref[:].astype(jnp.float32)
        qs_ref[:] = _rope_2d(q_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        ks_ref[:] = _rope_2d(kn_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        h, hd = q_ref.shape[1], q_ref.shape[2]
        kvh = kc_ref.shape[1]
        qf = qs_ref[:].reshape(kvh, groups, hd)
        k = kc_ref[0].astype(jnp.float32)  # (kvh, chunk, hd)
        v = vc_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qf, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        logits = logits.reshape(h, chunk)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
        # strictly BELOW pos: slot pos may hold stale data — the new token's
        # contribution enters from registers below
        logits = jnp.where(idx < pos, logits, NEG_INF)

        is_last = c == last
        # new-token logit per head: sum(q * k_new) over hd, grouped for GQA
        lnew = jnp.sum(qf * ks_ref[:][:, None, :], axis=2).reshape(h, 1) * scale
        lnew = jnp.where(is_last, lnew, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(
            m_prev, jnp.maximum(jnp.max(logits, axis=1, keepdims=True), lnew)
        )
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)  # (h, chunk)
        p_new = jnp.exp(lnew - m_new)  # (h, 1)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True) + p_new
        pv = jax.lax.dot_general(
            p.reshape(kvh, groups, chunk), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(h, hd)
        vn = vn_ref[0].astype(jnp.float32)  # (kvh, hd)
        vn_h = jnp.broadcast_to(vn[:, None, :], (kvh, groups, hd)).reshape(h, hd)
        acc_ref[:] = acc_ref[:] * corr + pv + p_new * vn_h
        m_ref[:] = m_new

        # cache write: the output blocks are 8-row aligned windows aliased
        # into the caches around slot pos (TPU blocks need >=8 sublanes; the
        # index map is constant over c -> ONE ~32 KB flush per cache per row,
        # vs a dynamic_update_slice dispatch each on the unfused path).  The
        # window's other 7 rows are copied from the resident chunk; the new
        # row is selected in f32 (Mosaic lacks the bf16 (kvh,hd)->(kvh,1,hd)
        # expand).
        @pl.when(is_last)
        def _():
            win = (pos // 8) * 8
            # 8-aligned offset inside this chunk (hint Mosaic can't derive)
            w = pl.multiple_of(win - last * chunk, 8)
            r = pos - win
            rowsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r
            kwin = kc_ref[0, :, pl.ds(w, 8), :].astype(jnp.float32)
            vwin = vc_ref[0, :, pl.ds(w, 8), :].astype(jnp.float32)
            kn3 = ks_ref[:][:, None, :]  # f32 (kvh, 1, hd), rotated
            ko_ref[0] = jnp.where(rowsel[None], kn3, kwin).astype(ko_ref.dtype)
            vo_ref[0] = jnp.where(rowsel[None], vn[:, None, :], vwin).astype(vo_ref.dtype)

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rotary_dim", "chunk", "interpret"))
def _fused_pallas(q, k_new, v_new, cos, sin, k_cache, v_cache, pos, *,
                  rotary_dim, chunk, interpret=False):
    b, h, hd = q.shape
    _, kvh, t, _ = k_cache.shape
    groups = h // kvh
    n_chunks = t // chunk
    scale = 1.0 / math.sqrt(hd)

    def kv_map(bi, c, pos):
        return (bi, 0, jnp.minimum(c, pos[bi] // chunk), 0)

    def out_row_map(bi, c, pos):
        # 8-row blocks on the seq dim -> block index = aligned window index
        return (bi, 0, pos[bi] // 8, 0)

    def row_map(bi, c, pos):
        return (bi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rotary_dim), lambda bi, c, pos: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rotary_dim), lambda bi, c, pos: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 8, hd), out_row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 8, hd), out_row_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
            pltpu.VMEM((kvh, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fused_kernel, chunk=chunk, groups=groups, scale=scale, rotary_dim=rotary_dim
    )
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, hd), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # inputs counted including the scalar-prefetch arg: pos=0, q=1,
        # k_new=2, v_new=3, cos=4, sin=5, k_cache=6, v_cache=7
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos_vec, q, k_new, v_new, cos, sin, k_cache, v_cache)


def _fused_xla(q, k_new, v_new, cos, sin, k_cache, v_cache, pos, rotary_dim):
    """Reference/fallback with identical semantics (used off-TPU)."""
    from ternary_vllm_tpu.ops.decode_attention import _decode_attention_xla

    b, h, hd = q.shape
    kvh = k_new.shape[1]

    def rope(x, c, s):
        xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
        half = rotary_dim // 2
        rot = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
        return jnp.concatenate([xr * c[:, None, :] + rot * s[:, None, :], xp], axis=-1)

    cf = cos.astype(jnp.float32)
    sf = sin.astype(jnp.float32)
    q_r = rope(q.astype(jnp.float32), cf, sf).astype(q.dtype)
    k_r = rope(k_new.astype(jnp.float32), cf, sf).astype(k_cache.dtype)

    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))

    def write(c, u, p):
        return jax.vmap(
            lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, pp, 0))
        )(c, u.astype(c.dtype), p)

    kc = write(k_cache, k_r[:, :, None, :], pos_vec)
    vc = write(v_cache, v_new[:, :, None, :].astype(v_cache.dtype), pos_vec)
    attn = _decode_attention_xla(q_r, kc, vc, pos_vec)
    return attn, kc, vc


def fused_decode_attention(
    q, k_new, v_new, cos, sin, k_cache, v_cache, pos,
    *, rotary_dim: int, chunk: int = 128, impl: str = "auto",
):
    """One-dispatch decode attention step.

    Args:
      q: (B, H, hd) UNROTATED query for the new token.
      k_new/v_new: (B, KVH, hd) unrotated key / value for the new token.
      cos/sin: (B, rotary_dim) rope factors for each row's position.
      k_cache/v_cache: (B, KVH, T, hd) — slot ``pos`` NOT yet written.
      pos: scalar or (B,) int32 — index the new token occupies; attention
        covers [0, pos].

    Returns ``(attn (B, H, hd), k_cache', v_cache')`` with the new K/V
    written at ``pos`` (caches are donated/aliased on TPU)."""
    t = k_cache.shape[2]
    shapes_ok = (
        t % chunk == 0 and t >= chunk
        and rotary_dim % 2 == 0 and q.shape[2] >= rotary_dim
    )
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = shapes_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if not use_pallas:
        return _fused_xla(q, k_new, v_new, cos, sin, k_cache, v_cache, pos, rotary_dim)
    return _fused_pallas(
        q, k_new, v_new, cos, sin, k_cache, v_cache, jnp.asarray(pos),
        rotary_dim=rotary_dim, chunk=chunk, interpret=not on_tpu,
    )
