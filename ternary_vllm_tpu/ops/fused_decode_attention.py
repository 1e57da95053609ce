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
        cos = cos_ref[0].astype(jnp.float32)  # (1, rd)
        sin = sin_ref[0].astype(jnp.float32)
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
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
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
    )(pos_vec, q, k_new, v_new, cos[:, None, :], sin[:, None, :], k_cache, v_cache)


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


# ---------------------------------------------------------------------------
# int8-cache variant: rope + in-kernel KV quantization + quantized write +
# flash attention over int8 codes (scales applied to logits/probabilities)
# ---------------------------------------------------------------------------


def _fused_kernel_i8(
    pos_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
    kq_ref, ks_ref, vq_ref, vs_ref,
    o_ref, kqo_ref, kso_ref, vqo_ref, vso_ref,
    m_ref, l_ref, acc_ref, qs_ref, kc_ref, vc_ref, sk_ref, sv_ref,
    *, chunk, groups, scale, rotary_dim,
):
    bi = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[bi]
    last = pos // chunk

    @pl.when(c == 0)
    def _():
        cos = cos_ref[0].astype(jnp.float32)
        sin = sin_ref[0].astype(jnp.float32)
        qs_ref[:] = _rope_2d(q_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        k_rot = _rope_2d(kn_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        # in-kernel absmax int8 quantization of the new K/V rows — codes and
        # scales land in scratch; the register-path contribution below uses the
        # DEQUANTIZED values so numerics match the unfused write-then-read path
        sk = jnp.maximum(jnp.max(jnp.abs(k_rot), axis=1, keepdims=True), 1e-6) / 127.0
        kc = jnp.clip(jnp.round(k_rot / sk), -127, 127)
        # round-trip through the cache dtype: the stored scale is bf16, so the
        # value read back is code * bf16(scale)
        sk_ref[:] = sk.astype(jnp.bfloat16).astype(jnp.float32)
        kc_ref[:] = kc
        vn = vn_ref[0].astype(jnp.float32)
        sv = jnp.maximum(jnp.max(jnp.abs(vn), axis=1, keepdims=True), 1e-6) / 127.0
        vc = jnp.clip(jnp.round(vn / sv), -127, 127)
        sv_ref[:] = sv.astype(jnp.bfloat16).astype(jnp.float32)
        vc_ref[:] = vc
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        h, hd = q_ref.shape[1], q_ref.shape[2]
        kvh = kq_ref.shape[1]
        qf = qs_ref[:].reshape(kvh, groups, hd)
        k = kq_ref[0].astype(jnp.float32)  # raw codes (kvh, chunk, hd)
        logits = jax.lax.dot_general(
            qf, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        logits = logits * ks_ref[0].astype(jnp.float32) * scale  # (kvh,1,chunk)
        logits = logits.reshape(h, chunk)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
        logits = jnp.where(idx < pos, logits, NEG_INF)

        is_last = c == last
        kdq = kc_ref[:] * sk_ref[:]  # dequantized new K (kvh, hd)
        lnew = jnp.sum(qf * kdq[:, None, :], axis=2).reshape(h, 1) * scale
        lnew = jnp.where(is_last, lnew, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(
            m_prev, jnp.maximum(jnp.max(logits, axis=1, keepdims=True), lnew)
        )
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        p_new = jnp.exp(lnew - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True) + p_new
        ps = p.reshape(kvh, groups, chunk) * vs_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            ps, vq_ref[0].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(h, hd)
        vdq = vc_ref[:] * sv_ref[:]  # dequantized new V
        vdq_h = jnp.broadcast_to(vdq[:, None, :], (kvh, groups, hd)).reshape(h, hd)
        acc_ref[:] = acc_ref[:] * corr + pv + p_new * vdq_h
        m_ref[:] = m_new

        # quantized cache write: 32-row aligned window for the int8 codes
        # (int8 sublane tile is 32), lane-select into the resident chunk for
        # the scales (scales are lane-major so slot pos is one LANE)
        @pl.when(is_last)
        def _():
            win = (pos // 32) * 32
            w = pl.multiple_of(win - last * chunk, 32)
            r = pos - win
            rowsel = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) == r
            kwin = kq_ref[0, :, pl.ds(w, 32), :].astype(jnp.float32)
            vwin = vq_ref[0, :, pl.ds(w, 32), :].astype(jnp.float32)
            kqo_ref[0] = jnp.where(rowsel[None], kc_ref[:][:, None, :], kwin).astype(jnp.int8)
            vqo_ref[0] = jnp.where(rowsel[None], vc_ref[:][:, None, :], vwin).astype(jnp.int8)
            lanesel = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) == (pos - last * chunk)
            kso_ref[0] = jnp.where(lanesel[None], sk_ref[:][:, :, None], ks_ref[0].astype(jnp.float32)).astype(kso_ref.dtype)
            vso_ref[0] = jnp.where(lanesel[None], sv_ref[:][:, :, None], vs_ref[0].astype(jnp.float32)).astype(vso_ref.dtype)

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rotary_dim", "chunk", "interpret"))
def _fused_pallas_i8(q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos, *,
                     rotary_dim, chunk, interpret=False):
    b, h, hd = q.shape
    _, kvh, t, _ = kq.shape
    groups = h // kvh
    n_chunks = t // chunk
    scale = 1.0 / math.sqrt(hd)

    def kv_map(bi, c, pos):
        return (bi, 0, jnp.minimum(c, pos[bi] // chunk), 0)

    def scale_map(bi, c, pos):
        return (bi, 0, 0, jnp.minimum(c, pos[bi] // chunk))

    def out_code_map(bi, c, pos):
        return (bi, 0, pos[bi] // 32, 0)  # 32-row int8 windows

    def out_scale_map(bi, c, pos):
        return (bi, 0, 0, pos[bi] // chunk)  # whole-chunk lane window

    def row_map(bi, c, pos):
        return (bi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), scale_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 32, hd), out_code_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), out_scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 32, hd), out_code_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), out_scale_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
            pltpu.VMEM((kvh, hd), jnp.float32),
            pltpu.VMEM((kvh, hd), jnp.float32),
            pltpu.VMEM((kvh, 1), jnp.float32),
            pltpu.VMEM((kvh, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fused_kernel_i8, chunk=chunk, groups=groups, scale=scale, rotary_dim=rotary_dim
    )
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, hd), q.dtype),
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        # inputs counted incl. scalar prefetch: pos=0, q=1, kn=2, vn=3, cos=4,
        # sin=5, kq=6, ks=7, vq=8, vs=9
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos_vec, q, k_new, v_new, cos[:, None, :], sin[:, None, :], kq, ks, vq, vs)


def _fused_xla_i8(q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos, rotary_dim):
    """Fallback with identical semantics to the unfused int8 path
    (rope → _quantize_kv → scatter write → decode_attention_int8)."""
    from ternary_vllm_tpu.models.phi import _quantize_kv
    from ternary_vllm_tpu.ops.decode_attention import decode_attention_int8

    b = q.shape[0]

    def rope(x, c, s):
        xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
        half = rotary_dim // 2
        rot = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
        return jnp.concatenate([xr * c[:, None, :] + rot * s[:, None, :], xp], axis=-1)

    cf = cos.astype(jnp.float32)
    sf = sin.astype(jnp.float32)
    q_r = rope(q.astype(jnp.float32), cf, sf).astype(q.dtype)
    k_r = rope(k_new.astype(jnp.float32), cf, sf)

    kq_new, ks_new = _quantize_kv(k_r[:, :, None, :])
    vq_new, vs_new = _quantize_kv(v_new[:, :, None, :].astype(jnp.float32))

    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))

    def write(c, u, p):
        return jax.vmap(
            lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, pp, 0))
        )(c, u.astype(c.dtype), p)

    def write_scale(c, u, p):
        return jax.vmap(
            lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, 0, pp))
        )(c, u.astype(c.dtype), p)

    kq = write(kq, kq_new, pos_vec)
    ks = write_scale(ks, ks_new, pos_vec)
    vq = write(vq, vq_new, pos_vec)
    vs = write_scale(vs, vs_new, pos_vec)
    attn = decode_attention_int8(q_r, kq, ks, vq, vs, pos_vec)
    return attn, kq, ks, vq, vs


def fused_decode_attention_int8(
    q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos,
    *, rotary_dim: int, chunk: int | None = None, impl: str = "auto",
):
    """One-dispatch int8-cache decode attention step: RoPE + absmax int8
    quantization of the new K/V row + quantized cache write + flash attention
    over int8 codes.  Same contract as :func:`fused_decode_attention` with the
    4-array cache (codes (B, KVH, T, hd) int8, scales lane-major
    (B, KVH, 1, T) bf16).  Halves attention HBM traffic vs the bf16 cache."""
    t = kq.shape[2]
    if chunk is None:
        from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk

        chunk = pick_decode_chunk(t, kq.shape[1], kq.shape[3], 1)
    shapes_ok = (
        t % chunk == 0 and t >= chunk and chunk % 32 == 0
        and rotary_dim % 2 == 0 and q.shape[2] >= rotary_dim
    )
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = shapes_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if not use_pallas:
        return _fused_xla_i8(q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos, rotary_dim)
    return _fused_pallas_i8(
        q, k_new, v_new, cos, sin, kq, ks, vq, vs, jnp.asarray(pos),
        rotary_dim=rotary_dim, chunk=chunk, interpret=not on_tpu,
    )


def fused_decode_attention(
    q, k_new, v_new, cos, sin, k_cache, v_cache, pos,
    *, rotary_dim: int, chunk: int | None = None, impl: str = "auto",
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
    if chunk is None:
        from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk

        chunk = pick_decode_chunk(t, k_cache.shape[1], k_cache.shape[3], k_cache.dtype.itemsize)
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


# ---------------------------------------------------------------------------
# T-major cache layout (B, KVH, hd, T): decode kernels without the lane-pad
# tax.  The row-major (B, KVH, T, hd) cache with hd < 128 is lane-padded to
# 128 inside the decode loop (pallas forces the default row-major layout on
# its operands), so the kernels stream 2x the logical KV bytes — measured
# only in the realistic multi-cache regime (single-buffer microbenches read
# anomalously fast; docs/DESIGN.md §6 round 4).  With T minor there is no
# padding: 24-layer round-robin busy time drops 176 -> 97 µs/call at 8k
# (chunk 256).  The cache write flushes the whole resident chunk block once
# (lane-select of the new column) instead of an 8-row window.
# ---------------------------------------------------------------------------


def _fused_kernel_tm(
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
        cos = cos_ref[0].astype(jnp.float32)
        sin = sin_ref[0].astype(jnp.float32)
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
        kT = kc_ref[0].astype(jnp.float32)  # (kvh, hd, chunk)
        logits = jax.lax.dot_general(
            qf, kT, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        logits = logits.reshape(h, chunk)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
        logits = jnp.where(idx < pos, logits, NEG_INF)

        is_last = c == last
        lnew = jnp.sum(qf * ks_ref[:][:, None, :], axis=2).reshape(h, 1) * scale
        lnew = jnp.where(is_last, lnew, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(
            m_prev, jnp.maximum(jnp.max(logits, axis=1, keepdims=True), lnew)
        )
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        p_new = jnp.exp(lnew - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True) + p_new
        vT = vc_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            p.reshape(kvh, groups, chunk), vT, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(h, hd)
        vn = vn_ref[0].astype(jnp.float32)
        vn_h = jnp.broadcast_to(vn[:, None, :], (kvh, groups, hd)).reshape(h, hd)
        acc_ref[:] = acc_ref[:] * corr + pv + p_new * vn_h
        m_ref[:] = m_new

        # cache write: lane-select the new token's column into the resident
        # chunk and flush the whole block ONCE (output index map constant
        # over c); slot pos is one LANE of the last live chunk
        @pl.when(is_last)
        def _():
            lanesel = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) == (pos - last * chunk)
            ko_ref[0] = jnp.where(lanesel[None], ks_ref[:][:, :, None], kT).astype(ko_ref.dtype)
            vo_ref[0] = jnp.where(lanesel[None], vn[:, :, None], vT).astype(vo_ref.dtype)

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rotary_dim", "chunk", "interpret"))
def _fused_pallas_tm(q, k_new, v_new, cos, sin, k_cache, v_cache, pos, *,
                     rotary_dim, chunk, interpret=False):
    b, h, hd = q.shape
    _, kvh, _, t = k_cache.shape
    groups = h // kvh
    n_chunks = t // chunk
    scale = 1.0 / math.sqrt(hd)

    def kv_map(bi, c, pos):
        return (bi, 0, 0, jnp.minimum(c, pos[bi] // chunk))

    def out_kv_map(bi, c, pos):
        return (bi, 0, 0, pos[bi] // chunk)

    def row_map(bi, c, pos):
        return (bi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), out_kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), out_kv_map, memory_space=pltpu.VMEM),
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
        _fused_kernel_tm, chunk=chunk, groups=groups, scale=scale, rotary_dim=rotary_dim
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
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos_vec, q, k_new, v_new, cos[:, None, :], sin[:, None, :], k_cache, v_cache)


def fused_decode_attention_tmajor(
    q, k_new, v_new, cos, sin, k_cache, v_cache, pos,
    *, rotary_dim: int, chunk: int | None = None, impl: str = "auto",
):
    """One-dispatch decode attention step on T-major caches
    ``(B, KVH, hd, T)`` — same contract as :func:`fused_decode_attention`
    with the transposed cache layout (returned caches are T-major too)."""
    t = k_cache.shape[3]
    if chunk is None:
        from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk

        chunk = pick_decode_chunk(t, k_cache.shape[1], k_cache.shape[2], k_cache.dtype.itemsize)
    shapes_ok = (
        t % chunk == 0 and t >= chunk
        and rotary_dim % 2 == 0 and q.shape[2] >= rotary_dim
    )
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = shapes_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if not use_pallas:
        attn, kc, vc = _fused_xla(
            q, k_new, v_new, cos, sin,
            jnp.swapaxes(k_cache, 2, 3), jnp.swapaxes(v_cache, 2, 3), pos, rotary_dim,
        )
        return attn, jnp.swapaxes(kc, 2, 3), jnp.swapaxes(vc, 2, 3)
    return _fused_pallas_tm(
        q, k_new, v_new, cos, sin, k_cache, v_cache, jnp.asarray(pos),
        rotary_dim=rotary_dim, chunk=chunk, interpret=not on_tpu,
    )


def _fused_kernel_i8_tm(
    pos_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
    kq_ref, ks_ref, vq_ref, vs_ref,
    o_ref, kqo_ref, kso_ref, vqo_ref, vso_ref,
    m_ref, l_ref, acc_ref, qs_ref, kc_ref, vc_ref, sk_ref, sv_ref,
    *, chunk, groups, scale, rotary_dim,
):
    bi = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[bi]
    last = pos // chunk

    @pl.when(c == 0)
    def _():
        cos = cos_ref[0].astype(jnp.float32)
        sin = sin_ref[0].astype(jnp.float32)
        qs_ref[:] = _rope_2d(q_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        k_rot = _rope_2d(kn_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        sk = jnp.maximum(jnp.max(jnp.abs(k_rot), axis=1, keepdims=True), 1e-6) / 127.0
        kc = jnp.clip(jnp.round(k_rot / sk), -127, 127)
        sk_ref[:] = sk.astype(jnp.bfloat16).astype(jnp.float32)
        kc_ref[:] = kc
        vn = vn_ref[0].astype(jnp.float32)
        sv = jnp.maximum(jnp.max(jnp.abs(vn), axis=1, keepdims=True), 1e-6) / 127.0
        vc = jnp.clip(jnp.round(vn / sv), -127, 127)
        sv_ref[:] = sv.astype(jnp.bfloat16).astype(jnp.float32)
        vc_ref[:] = vc
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        h, hd = q_ref.shape[1], q_ref.shape[2]
        kvh = kq_ref.shape[1]
        qf = qs_ref[:].reshape(kvh, groups, hd)
        k = kq_ref[0].astype(jnp.float32)  # raw codes (kvh, hd, chunk)
        logits = jax.lax.dot_general(
            qf, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        logits = logits * ks_ref[0].astype(jnp.float32) * scale  # (kvh, g, chunk)
        logits = logits.reshape(h, chunk)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
        logits = jnp.where(idx < pos, logits, NEG_INF)

        is_last = c == last
        kdq = kc_ref[:] * sk_ref[:]
        lnew = jnp.sum(qf * kdq[:, None, :], axis=2).reshape(h, 1) * scale
        lnew = jnp.where(is_last, lnew, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(
            m_prev, jnp.maximum(jnp.max(logits, axis=1, keepdims=True), lnew)
        )
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        p_new = jnp.exp(lnew - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True) + p_new
        ps = p.reshape(kvh, groups, chunk) * vs_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            ps, vq_ref[0].astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(h, hd)
        vdq = vc_ref[:] * sv_ref[:]
        vdq_h = jnp.broadcast_to(vdq[:, None, :], (kvh, groups, hd)).reshape(h, hd)
        acc_ref[:] = acc_ref[:] * corr + pv + p_new * vdq_h
        m_ref[:] = m_new

        @pl.when(is_last)
        def _():
            lanesel = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) == (pos - last * chunk)
            kqo_ref[0] = jnp.where(lanesel[None], kc_ref[:][:, :, None], k).astype(jnp.int8)
            vqo_ref[0] = jnp.where(lanesel[None], vc_ref[:][:, :, None], vq_ref[0].astype(jnp.float32)).astype(jnp.int8)
            kso_ref[0] = jnp.where(lanesel[None], sk_ref[:][:, :, None], ks_ref[0].astype(jnp.float32)).astype(kso_ref.dtype)
            vso_ref[0] = jnp.where(lanesel[None], sv_ref[:][:, :, None], vs_ref[0].astype(jnp.float32)).astype(vso_ref.dtype)

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rotary_dim", "chunk", "interpret"))
def _fused_pallas_i8_tm(q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos, *,
                        rotary_dim, chunk, interpret=False):
    b, h, hd = q.shape
    _, kvh, _, t = kq.shape
    groups = h // kvh
    n_chunks = t // chunk
    scale = 1.0 / math.sqrt(hd)

    def kv_map(bi, c, pos):
        return (bi, 0, 0, jnp.minimum(c, pos[bi] // chunk))

    def scale_map(bi, c, pos):
        return (bi, 0, 0, jnp.minimum(c, pos[bi] // chunk))

    def out_kv_map(bi, c, pos):
        return (bi, 0, 0, pos[bi] // chunk)

    def row_map(bi, c, pos):
        return (bi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), scale_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, hd), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), out_kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), out_kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd, chunk), out_kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), out_kv_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
            pltpu.VMEM((kvh, hd), jnp.float32),
            pltpu.VMEM((kvh, hd), jnp.float32),
            pltpu.VMEM((kvh, 1), jnp.float32),
            pltpu.VMEM((kvh, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fused_kernel_i8_tm, chunk=chunk, groups=groups, scale=scale, rotary_dim=rotary_dim
    )
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, hd), q.dtype),
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos_vec, q, k_new, v_new, cos[:, None, :], sin[:, None, :], kq, ks, vq, vs)


def fused_decode_attention_int8_tmajor(
    q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos,
    *, rotary_dim: int, chunk: int | None = None, impl: str = "auto",
):
    """int8-cache decode step on T-major code caches (codes (B, KVH, hd, T)
    int8, scales lane-major (B, KVH, 1, T) — scales are already T-minor so
    only the code arrays transpose)."""
    t = kq.shape[3]
    if chunk is None:
        from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk

        chunk = pick_decode_chunk(t, kq.shape[1], kq.shape[2], 1)
    shapes_ok = (
        t % chunk == 0 and t >= chunk and chunk % 32 == 0
        and rotary_dim % 2 == 0 and q.shape[2] >= rotary_dim
    )
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = shapes_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if not use_pallas:
        attn, kq2, ks2, vq2, vs2 = _fused_xla_i8(
            q, k_new, v_new, cos, sin,
            jnp.swapaxes(kq, 2, 3), ks, jnp.swapaxes(vq, 2, 3), vs, pos, rotary_dim,
        )
        return attn, jnp.swapaxes(kq2, 2, 3), ks2, jnp.swapaxes(vq2, 2, 3), vs2
    return _fused_pallas_i8_tm(
        q, k_new, v_new, cos, sin, kq, ks, vq, vs, jnp.asarray(pos),
        rotary_dim=rotary_dim, chunk=chunk, interpret=not on_tpu,
    )
