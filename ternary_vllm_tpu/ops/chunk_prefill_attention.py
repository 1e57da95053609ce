"""Chunk-prefill attention: a block of queries attends a fixed-capacity KV
cache prefix — the flash-style Pallas kernel behind the engine's chunked
long-prompt admission and prefix-cached suffix prefill.

Why: prefilling a chunk at ``start > 0`` (long-prompt chunked admission,
suffix-after-prefix splicing) previously fell back to masked dense attention
over the FULL cache capacity — an (B, H, T, C) f32 score tensor (1+ GB at
C=8192) that is slow to compile and reads all ``C`` slots regardless of live
length.  This kernel:

* gets ``start`` as a scalar-prefetch argument, so ONE compiled program
  serves every chunk of every admission (the dense path recompiled per
  shape and materialized full scores);
* bounds HBM reads by the live length — the BlockSpec index map clamps
  dead KV chunks to the last needed block and Pallas skips the repeat DMA
  (same trick as ``ops/decode_attention.py``);
* runs online-softmax per 128-query tile entirely in VMEM.

Semantics: query row ``i`` of the chunk sits at global position
``start + i`` and attends cache slots ``[0, start + i]``.  The chunk's own
K/V must already be written into the cache at ``[start, start + T)``
(callers do the rope + cache write first; garbage beyond the written region
is never attended because it sits at higher positions than every query).

GQA-aware: kv head ``g`` serves query heads ``[g*groups, (g+1)*groups)`` —
the cache is read with KV heads, never repeated/materialized.

Reference capability: the TF model's prefill attention is masked dense
softmax (``impl/tf/moondream/layers.py:130-141``) with context hard-capped
at 2048 (``layers.py:393``); this kernel is the TPU-native long-context
replacement (net-new, no reference counterpart).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)


def _kernel(
    start_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, tq, ckv, groups, scale,
):
    """One program = one (batch, kv-head, q-tile, kv-chunk) cell; kv-chunk is
    the innermost (arbitrary) grid dim accumulating online softmax."""
    bi = pl.program_id(0)
    qb = pl.program_id(2)
    c = pl.program_id(3)
    start = start_ref[bi]
    q_hi = start + (qb + 1) * tq - 1  # highest global q position in the tile
    last = q_hi // ckv  # last kv chunk any of these queries may attend

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        hd = q_ref.shape[-1]
        rows = groups * tq
        q = q_ref[0, 0].reshape(rows, hd)  # (groups*tq, hd), groups-major
        k = k_ref[0, 0].astype(q.dtype)  # (ckv, hd); cache may be bf16 vs f32 q
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (rows, ckv)
        iq = jax.lax.broadcasted_iota(jnp.int32, (rows, ckv), 0) % tq
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, ckv), 1) + c * ckv
        ok = kv_pos <= start + qb * tq + iq
        logits = jnp.where(ok, logits, NEG_INF)

        m_prev = m_ref[:]  # (rows, 1)
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)  # (rows, ckv) f32
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (rows, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(3) - 1))
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = out.reshape(groups, tq, q_ref.shape[-1]).astype(o_ref.dtype)


def _kernel_i8(
    start_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref,
    *, tq, ckv, groups, scale,
):
    """int8-cache variant: raw codes feed both dots; the per-position scales
    (lane-major (B, KVH, 1, C)) multiply the logits / probabilities instead
    of dequantizing (ops/decode_attention.py's trick, tiled over queries)."""
    bi = pl.program_id(0)
    qb = pl.program_id(2)
    c = pl.program_id(3)
    start = start_ref[bi]
    q_hi = start + (qb + 1) * tq - 1
    last = q_hi // ckv

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        hd = q_ref.shape[-1]
        rows = groups * tq
        q = q_ref[0, 0].reshape(rows, hd)
        # int8 codes are exact in bf16 (<= 2^8): cast feeds the MXU
        k = kq_ref[0, 0].astype(q.dtype)  # (ckv, hd)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = logits * ks_ref[0, 0].astype(jnp.float32) * scale  # (1, ckv) bcast
        iq = jax.lax.broadcasted_iota(jnp.int32, (rows, ckv), 0) % tq
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, ckv), 1) + c * ckv
        ok = kv_pos <= start + qb * tq + iq
        logits = jnp.where(ok, logits, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        ps = p * vs_ref[0, 0].astype(jnp.float32)  # fold V scales per column
        pv = jax.lax.dot_general(
            ps.astype(q.dtype), vq_ref[0, 0].astype(q.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(3) - 1))
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = out.reshape(groups, tq, q_ref.shape[-1]).astype(o_ref.dtype)


def _small_kernel(
    start_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, tq, ckv, groups, scale,
):
    """Small-T variant (speculative verify windows, short suffixes): ALL kv
    heads in one program per (batch, kv-chunk) cell — per-head grid programs
    cost ~2-5 us of fixed overhead each, which dwarfs the tiny tile's
    compute (measured: per-head tiles made k=4 verify 25% SLOWER than the
    dense fallback; this variant is the decode kernel's all-heads shape
    generalized from 1 query row to tq)."""
    bi = pl.program_id(0)
    c = pl.program_id(1)
    start = start_ref[bi]
    last = (start + tq - 1) // ckv

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        kvh, _, hd = k_ref.shape[1], k_ref.shape[2], k_ref.shape[3]
        rows = groups * tq
        q = q_ref[0].reshape(kvh, rows, hd)
        k = k_ref[0].astype(q.dtype)  # (kvh, ckv, hd)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # (kvh, rows, ckv)
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 1) % tq
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 2) + c * ckv
        ok = kv_pos <= start + iq
        logits = jnp.where(ok, logits, NEG_INF)
        logits2 = logits.reshape(kvh * rows, ckv)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits2 - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(kvh, rows, ckv).astype(v_ref.dtype), v_ref[0],
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ).reshape(kvh * rows, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        kvh, hd = k_ref.shape[1], k_ref.shape[3]
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(kvh, groups, tq, hd).astype(o_ref.dtype)


def _small_kernel_i8(
    start_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref,
    *, tq, ckv, groups, scale,
):
    """int8-cache small-T variant: scales fold into logits/probs."""
    bi = pl.program_id(0)
    c = pl.program_id(1)
    start = start_ref[bi]
    last = (start + tq - 1) // ckv

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        kvh, hd = kq_ref.shape[1], kq_ref.shape[3]
        rows = groups * tq
        q = q_ref[0].reshape(kvh, rows, hd)
        k = kq_ref[0].astype(q.dtype)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        logits = logits * ks_ref[0].astype(jnp.float32) * scale  # (kvh,1,ckv) bcast
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 1) % tq
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 2) + c * ckv
        logits = jnp.where(kv_pos <= start + iq, logits, NEG_INF)
        logits2 = logits.reshape(kvh * rows, ckv)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits2 - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        ps = p.reshape(kvh, rows, ckv) * vs_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            ps.astype(q.dtype), vq_ref[0].astype(q.dtype),
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ).reshape(kvh * rows, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        kvh, hd = kq_ref.shape[1], kq_ref.shape[3]
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(kvh, groups, tq, hd).astype(o_ref.dtype)


def _small_grid_spec(b, kvh, groups, c_cap, hd, tq, ckv, int8):
    n_c = c_cap // ckv

    def q_map(bi, c, start):
        return (bi, 0, 0, 0, 0)

    def kv_map(bi, c, start):
        last = (start[bi] + tq - 1) // ckv
        return (bi, 0, jnp.minimum(c, last), 0)

    def scale_map(bi, c, start):
        last = (start[bi] + tq - 1) // ckv
        return (bi, 0, 0, jnp.minimum(c, last))

    kv_spec = pl.BlockSpec((1, kvh, ckv, hd), kv_map, memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, kvh, groups, tq, hd), q_map, memory_space=pltpu.VMEM)
    if int8:
        sc_spec = pl.BlockSpec((1, kvh, 1, ckv), scale_map, memory_space=pltpu.VMEM)
        in_specs = [q_spec, kv_spec, sc_spec, kv_spec, sc_spec]
    else:
        in_specs = [q_spec, kv_spec, kv_spec]
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_c),
        in_specs=in_specs,
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((kvh * groups * tq, 1), jnp.float32),
            pltpu.VMEM((kvh * groups * tq, 1), jnp.float32),
            pltpu.VMEM((kvh * groups * tq, hd), jnp.float32),
        ],
    )


@functools.partial(jax.jit, static_argnames=("tq", "ckv"))
def _chunk_prefill_pallas_small(q, k_cache, v_cache, start, tq: int, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = k_cache.shape[1], k_cache.shape[2]
    groups = h // kvh
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _small_grid_spec(b, kvh, groups, c_cap, hd, tq, ckv, int8=False)
    kernel = functools.partial(
        _small_kernel, tq=tq, ckv=ckv, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, k_cache, v_cache)
    return out.reshape(b, h, t, hd)


@functools.partial(jax.jit, static_argnames=("tq", "ckv"))
def _chunk_prefill_pallas_small_i8(q, kq, ks, vq, vs, start, tq: int, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = kq.shape[1], kq.shape[2]
    groups = h // kvh
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _small_grid_spec(b, kvh, groups, c_cap, hd, tq, ckv, int8=True)
    kernel = functools.partial(
        _small_kernel_i8, tq=tq, ckv=ckv, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, kq, ks, vq, vs)
    return out.reshape(b, h, t, hd)


def _small_kernel_tmajor(
    start_ref, q_ref, kt_ref, vt_ref, o_ref, m_ref, l_ref, acc_ref,
    *, tq, ckv, groups, scale,
):
    """T-major-cache small-T variant (speculative k+1 verify windows on
    long-context engines; round-4 VERDICT weak #4 — T-major used to support
    single-token decode only).  The cache IS K-transposed ``(KVH, hd, C)``,
    so QK^T contracts hd on axis 1 directly and PV contracts the chunk on
    V's axis 2 — no in-kernel transpose, same bytes as row-major."""
    bi = pl.program_id(0)
    c = pl.program_id(1)
    start = start_ref[bi]
    last = (start + tq - 1) // ckv

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        kvh, hd = kt_ref.shape[1], kt_ref.shape[2]
        rows = groups * tq
        q = q_ref[0].reshape(kvh, rows, hd)
        k_t = kt_ref[0].astype(q.dtype)  # (kvh, hd, ckv)
        logits = jax.lax.dot_general(
            q, k_t, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # (kvh, rows, ckv)
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 1) % tq
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 2) + c * ckv
        logits = jnp.where(kv_pos <= start + iq, logits, NEG_INF)
        logits2 = logits.reshape(kvh * rows, ckv)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits2 - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(kvh, rows, ckv).astype(vt_ref.dtype), vt_ref[0],
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ).reshape(kvh * rows, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        kvh, hd = kt_ref.shape[1], kt_ref.shape[2]
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(kvh, groups, tq, hd).astype(o_ref.dtype)


def _small_kernel_tmajor_i8(
    start_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref,
    *, tq, ckv, groups, scale,
):
    """int8 T-major small-T variant: codes are T-major, scales stay
    lane-major (B, KVH, 1, C) in both layouts."""
    bi = pl.program_id(0)
    c = pl.program_id(1)
    start = start_ref[bi]
    last = (start + tq - 1) // ckv

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        kvh, hd = kq_ref.shape[1], kq_ref.shape[2]
        rows = groups * tq
        q = q_ref[0].reshape(kvh, rows, hd)
        k_t = kq_ref[0].astype(q.dtype)  # (kvh, hd, ckv) int8 codes
        logits = jax.lax.dot_general(
            q, k_t, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        logits = logits * ks_ref[0].astype(jnp.float32) * scale  # (kvh,1,ckv) bcast
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 1) % tq
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, rows, ckv), 2) + c * ckv
        logits = jnp.where(kv_pos <= start + iq, logits, NEG_INF)
        logits2 = logits.reshape(kvh * rows, ckv)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits2 - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        ps = p.reshape(kvh, rows, ckv) * vs_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            ps.astype(q.dtype), vq_ref[0].astype(q.dtype),
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ).reshape(kvh * rows, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        kvh, hd = kq_ref.shape[1], kq_ref.shape[2]
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(kvh, groups, tq, hd).astype(o_ref.dtype)


def _small_grid_spec_tmajor(b, kvh, groups, c_cap, hd, tq, ckv, int8):
    n_c = c_cap // ckv

    def q_map(bi, c, start):
        return (bi, 0, 0, 0, 0)

    def kv_map(bi, c, start):
        last = (start[bi] + tq - 1) // ckv
        return (bi, 0, 0, jnp.minimum(c, last))

    def scale_map(bi, c, start):
        last = (start[bi] + tq - 1) // ckv
        return (bi, 0, 0, jnp.minimum(c, last))

    kv_spec = pl.BlockSpec((1, kvh, hd, ckv), kv_map, memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, kvh, groups, tq, hd), q_map, memory_space=pltpu.VMEM)
    if int8:
        sc_spec = pl.BlockSpec((1, kvh, 1, ckv), scale_map, memory_space=pltpu.VMEM)
        in_specs = [q_spec, kv_spec, sc_spec, kv_spec, sc_spec]
    else:
        in_specs = [q_spec, kv_spec, kv_spec]
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_c),
        in_specs=in_specs,
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((kvh * groups * tq, 1), jnp.float32),
            pltpu.VMEM((kvh * groups * tq, 1), jnp.float32),
            pltpu.VMEM((kvh * groups * tq, hd), jnp.float32),
        ],
    )


@functools.partial(jax.jit, static_argnames=("tq", "ckv"))
def _chunk_prefill_pallas_small_tmajor(q, k_t, v_t, start, tq: int, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = k_t.shape[1], k_t.shape[3]
    groups = h // kvh
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _small_grid_spec_tmajor(b, kvh, groups, c_cap, hd, tq, ckv, int8=False)
    kernel = functools.partial(
        _small_kernel_tmajor, tq=tq, ckv=ckv, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, k_t, v_t)
    return out.reshape(b, h, t, hd)


@functools.partial(jax.jit, static_argnames=("tq", "ckv"))
def _chunk_prefill_pallas_small_tmajor_i8(q, kq, ks, vq, vs, start, tq: int, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = kq.shape[1], kq.shape[3]
    groups = h // kvh
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _small_grid_spec_tmajor(b, kvh, groups, c_cap, hd, tq, ckv, int8=True)
    kernel = functools.partial(
        _small_kernel_tmajor_i8, tq=tq, ckv=ckv, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, kq, ks, vq, vs)
    return out.reshape(b, h, t, hd)


#: T at or below this uses the all-heads-per-program small kernel
_SMALL_T = 32

#: T above this falls back from the heads-grouped kernel to the per-q-tile
#: kernel (whole-chunk-resident tiles exceed the scoped-vmem stack)
_HG_MAX_T = 1024


# ---------------------------------------------------------------------------
# Heads-grouped large-T kernel (round 4).
#
# The round-3 tiled kernel (grid (B, KVH, T/tq, C/ckv)) re-streamed the live
# KV once PER 128-query tile and paid one grid cell per (head, q-tile,
# kv-chunk) — at T=1024, C=8448 that is 8448 cells/layer and ~2 GB of KV
# re-reads per layer-chunk; the 8k-admission trace showed a FLAT 3.8 ms per
# layer-chunk (19x the attention roofline), 72% of total prefill time.  This
# variant keeps the WHOLE chunk's queries resident in VMEM for a group of
# ``hg`` kv heads (grid (B, KVH/hg, C/ckv)), so the live KV streams exactly
# once per head-group and the grid shrinks ~30x.  Online-softmax state lives
# in scratch across the kv-chunk (innermost, arbitrary) dimension.
# ---------------------------------------------------------------------------


def _kernel_hg(
    start_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, t, ckv, hg, groups, scale,
):
    bi = pl.program_id(0)
    c = pl.program_id(2)
    start = start_ref[bi]
    last = (start + t - 1) // ckv  # last kv chunk any query row may attend

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # a kv chunk is FULLY visible when its highest position precedes every
    # query row ((c+1)*ckv - 1 <= start): the mask iotas/compares/select are
    # ~3 extra VPU passes over the (hg, r, ckv) tile, and during late
    # admission chunks nearly all kv chunks qualify — branch them away
    full_vis = (c + 1) * ckv - 1 <= start

    def _update(masked: bool):
        hd = q_ref.shape[-1]
        r = groups * t
        q = q_ref[0].reshape(hg, r, hd)
        k = k_ref[0].astype(q.dtype)  # (hg, ckv, hd)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # (hg, r, ckv)
        if masked:
            iq = jax.lax.broadcasted_iota(jnp.int32, (1, r, ckv), 1) % t
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, r, ckv), 2) + c * ckv
            logits = jnp.where(kv_pos <= start + iq, logits, NEG_INF)
        logits2 = logits.reshape(hg * r, ckv)

        # rows fully masked in this chunk self-correct: their m stays NEG_INF
        # (finite), p == 1 inflates l/acc, and the first chunk with a real
        # logit zeroes both via corr = exp(NEG_INF - m_real) == 0.
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits2 - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(hg, r, ckv).astype(v_ref.dtype), v_ref[0],
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ).reshape(hg * r, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when((c <= last) & full_vis)
    def _():
        _update(masked=False)

    @pl.when((c <= last) & jnp.logical_not(full_vis))
    def _():
        _update(masked=True)

    @pl.when(c == jnp.minimum(last, pl.num_programs(2) - 1))
    def _():
        hd = q_ref.shape[-1]
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(hg, groups, t, hd).astype(o_ref.dtype)


def _kernel_hg_i8(
    start_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref,
    *, t, ckv, hg, groups, scale,
):
    bi = pl.program_id(0)
    c = pl.program_id(2)
    start = start_ref[bi]
    last = (start + t - 1) // ckv

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    full_vis = (c + 1) * ckv - 1 <= start

    def _update(masked: bool):
        hd = q_ref.shape[-1]
        r = groups * t
        q = q_ref[0].reshape(hg, r, hd)
        k = kq_ref[0].astype(q.dtype)  # int8 codes exact in bf16
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        logits = logits * ks_ref[0].astype(jnp.float32) * scale  # (hg,1,ckv) bcast
        if masked:
            iq = jax.lax.broadcasted_iota(jnp.int32, (1, r, ckv), 1) % t
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, r, ckv), 2) + c * ckv
            logits = jnp.where(kv_pos <= start + iq, logits, NEG_INF)
        logits2 = logits.reshape(hg * r, ckv)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits2 - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        ps = p.reshape(hg, r, ckv) * vs_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            ps.astype(q.dtype), vq_ref[0].astype(q.dtype),
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        ).reshape(hg * r, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when((c <= last) & full_vis)
    def _():
        _update(masked=False)

    @pl.when((c <= last) & jnp.logical_not(full_vis))
    def _():
        _update(masked=True)

    @pl.when(c == jnp.minimum(last, pl.num_programs(2) - 1))
    def _():
        hd = q_ref.shape[-1]
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(hg, groups, t, hd).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# v3 (round 5): heads-grouped kernel with an IN-KERNEL q-tile loop.
#
# The round-4 hg kernel materializes (hg, groups*t, ckv) f32 logits per
# branch; at t=2048 even hg=1 busts the 16 MB scoped-vmem stack (DESIGN.md
# §6 round-4 prefill study), capping the admission chunk at 1024 and the
# head group at 2-4.  v3 keeps the same grid (B, KVH/hg, C/ckv) and the
# whole chunk's queries + softmax state resident, but walks the chunk in
# ``tq``-row tiles inside the kernel: per-branch intermediates shrink from
# r×ckv to (groups·tq)×ckv, so t=2048 compiles and hg can grow (fewer KV
# re-streams per layer-chunk).  The mask-skip branch is per TILE — late
# tiles of a chunk keep the VPU mask passes only where the causal frontier
# actually crosses.
# ---------------------------------------------------------------------------


def _kernel_hg_v3(
    start_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, t, ckv, hg, groups, tq, scale,
):
    bi = pl.program_id(0)
    c = pl.program_id(2)
    start = start_ref[bi]
    last = (start + t - 1) // ckv
    hd = q_ref.shape[-1]
    hgg = hg * groups
    n_tiles = t // tq

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for ti in range(n_tiles):
        ts = ti * tq
        rt = groups * tq
        # visible to the tile's FIRST row (iq = ts) => visible to all its rows
        tile_vis = (c + 1) * ckv - 1 <= start + ts
        # any element visible: chunk start precedes the tile's LAST position
        tile_live = (c * ckv <= start + ts + tq - 1) & (c <= last)

        def _upd(masked: bool, ti=ti, ts=ts, rt=rt):
            # per-tile scratch SLAB (leading static index — no lane/sublane
            # shape casts, which Mosaic rejects for (hgg, tq) <-> (hgg*tq, 1))
            qt = q_ref[0, :, :, ts : ts + tq, :].reshape(hg, rt, hd)
            kk = k_ref[0].astype(qt.dtype)  # (hg, ckv, hd)
            logits = jax.lax.dot_general(
                qt, kk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # (hg, rt, ckv)
            if masked:
                iq = ts + jax.lax.broadcasted_iota(jnp.int32, (1, rt, ckv), 1) % tq
                kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, rt, ckv), 2) + c * ckv
                logits = jnp.where(kv_pos <= start + iq, logits, NEG_INF)
            logits2 = logits.reshape(hgg * tq, ckv)

            m_prev = m_ref[ti]
            m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits2 - m_new)
            l_ref[ti] = l_ref[ti] * corr + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.reshape(hg, rt, ckv).astype(v_ref.dtype), v_ref[0],
                (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
            ).reshape(hgg * tq, hd)
            acc_ref[ti] = acc_ref[ti] * corr + pv
            m_ref[ti] = m_new

        @pl.when(tile_live & tile_vis)
        def _():
            _upd(masked=False)

        @pl.when(tile_live & jnp.logical_not(tile_vis))
        def _():
            _upd(masked=True)

    @pl.when(c == jnp.minimum(last, pl.num_programs(2) - 1))
    def _():
        for ti in range(n_tiles):
            ts = ti * tq
            out = acc_ref[ti] / jnp.maximum(l_ref[ti], 1e-30)
            o_ref[0, :, :, ts : ts + tq, :] = out.reshape(
                hg, groups, tq, hd
            ).astype(o_ref.dtype)


def _kernel_hg_v3_i8(
    start_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref,
    *, t, ckv, hg, groups, tq, scale,
):
    bi = pl.program_id(0)
    c = pl.program_id(2)
    start = start_ref[bi]
    last = (start + t - 1) // ckv
    hd = q_ref.shape[-1]
    hgg = hg * groups
    n_tiles = t // tq

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for ti in range(n_tiles):
        ts = ti * tq
        rt = groups * tq
        tile_vis = (c + 1) * ckv - 1 <= start + ts
        tile_live = (c * ckv <= start + ts + tq - 1) & (c <= last)

        def _upd(masked: bool, ti=ti, ts=ts, rt=rt):
            qt = q_ref[0, :, :, ts : ts + tq, :].reshape(hg, rt, hd)
            kk = kq_ref[0].astype(qt.dtype)  # int8 codes exact in bf16
            logits = jax.lax.dot_general(
                qt, kk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            logits = logits * ks_ref[0].astype(jnp.float32) * scale
            if masked:
                iq = ts + jax.lax.broadcasted_iota(jnp.int32, (1, rt, ckv), 1) % tq
                kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, rt, ckv), 2) + c * ckv
                logits = jnp.where(kv_pos <= start + iq, logits, NEG_INF)
            logits2 = logits.reshape(hgg * tq, ckv)

            m_prev = m_ref[ti]
            m_new = jnp.maximum(m_prev, jnp.max(logits2, axis=1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits2 - m_new)
            l_ref[ti] = l_ref[ti] * corr + jnp.sum(p, axis=1, keepdims=True)
            ps = p.reshape(hg, rt, ckv) * vs_ref[0].astype(jnp.float32)
            pv = jax.lax.dot_general(
                ps.astype(qt.dtype), vq_ref[0].astype(qt.dtype),
                (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
            ).reshape(hgg * tq, hd)
            acc_ref[ti] = acc_ref[ti] * corr + pv
            m_ref[ti] = m_new

        @pl.when(tile_live & tile_vis)
        def _():
            _upd(masked=False)

        @pl.when(tile_live & jnp.logical_not(tile_vis))
        def _():
            _upd(masked=True)

    @pl.when(c == jnp.minimum(last, pl.num_programs(2) - 1))
    def _():
        for ti in range(n_tiles):
            ts = ti * tq
            out = acc_ref[ti] / jnp.maximum(l_ref[ti], 1e-30)
            o_ref[0, :, :, ts : ts + tq, :] = out.reshape(
                hg, groups, tq, hd
            ).astype(o_ref.dtype)


_V3_TQ = 128  # in-kernel q-tile rows (per head, pre-groups); measured best
_V3_MAX_T = 2048  # v3 compiles chunk 2048 (the round-4 kernel could not)


def _pick_v3_ckv(c_cap: int) -> int:
    """Largest kv-chunk (multiple of 128, <= 1536) dividing the capacity.

    The round-5 sweep (BENCHMARKS.md prefill v3 table) showed the kernel is
    MXU-depth-bound, not DMA-bound: ckv is the PV dot's contraction depth
    and the QK dot's output width, and growing it 256 -> 1408 cut busy time
    2.1x.  Beyond ~1536 the single-buffer K/V block starts crowding VMEM
    with no further dot-efficiency gain (8448-capacity sweep: 1408 beats
    2816/4224/8448)."""
    best = 0
    for mult in range(1, 13):
        ckv = 128 * mult
        if c_cap % ckv == 0:
            best = ckv
    return best


def _pick_hg_v3(kvh: int, groups: int, t: int, hd: int, ckv: int, kv_itemsize: int, tq: int) -> int:
    """v3 budget: per-branch logits intermediates are TILE-bounded.  The
    dominant scoped-vmem term is the ~3 live (hg, groups*tq, ckv) f32
    tensors per branch; 13.75 MB calibrated on-chip against anchors that
    pin it from BOTH sides (round 5): flagship cap 8448 (ckv=1408, tq=128,
    t=1024, hg=4) bf16 estimates 13.03 MB, compiles, and measured fastest,
    and the high-GQA i8 case (groups=4, ckv=1024, t=640, hg=1) estimates
    13.52 MB and must stay feasible — both under budget; cap 16640
    (ckv=1280, tq=128, t=2048, hg=4) estimates 14.06 MB but actually needs
    17 MB of scoped vmem (the 16k-serving cliff found by bench_long) — must
    exceed budget so hg drops to 2, which compiles."""
    budget = int(13.75 * 1024 * 1024)
    n_logits = 2 if kv_itemsize == 1 else 1
    for hg in (8, 4, 2, 1):
        if kvh % hg != 0:
            continue
        r = groups * t
        est = (
            2 * hg * r * hd * 2  # q + o, bf16, resident
            + 2 * 2 * hg * ckv * hd * kv_itemsize  # K/V double-buffered
            + hg * r * (hd + 2) * 4  # acc + m + l scratch, f32
            + 3 * n_logits * hg * groups * tq * ckv * 4  # tile intermediates
        )
        if est <= budget:
            return hg
    return 0


def _pick_v3_tile(kvh: int, groups: int, t: int, hd: int, ckv: int, kv_itemsize: int):
    """(tq, hg) for the v3 kernel: small tiles first (tq=128 measured best —
    they keep the per-branch intermediates small, which buys a larger head
    group and therefore fewer grid cells)."""
    for tqq in (_V3_TQ, 256, 512):
        tqq = min(tqq, -(-t // 128) * 128)
        tp_pad = -(-t // tqq) * tqq
        hg = _pick_hg_v3(kvh, groups, tp_pad, hd, ckv, kv_itemsize, tqq)
        if hg > 0:
            return tqq, hg
    return 0, 0


@functools.partial(jax.jit, static_argnames=("ckv", "tq", "hg_override"))
def _chunk_prefill_pallas_hg_v3(q, k_cache, v_cache, start, ckv: int, tq: int = _V3_TQ, hg_override: int = 0):
    b, h, t, hd = q.shape
    kvh, c_cap = k_cache.shape[1], k_cache.shape[2]
    groups = h // kvh
    tq = min(tq, t)
    hg = hg_override or _pick_hg_v3(kvh, groups, t, hd, ckv, 2, tq)
    if hg == 0 or t % tq:
        raise ValueError(f"v3 kernel needs t % tq == 0 and a VMEM-feasible hg (t={t}, tq={tq}, hg={hg})")
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _hg_v3_grid_spec(b, kvh, hg, groups, t, c_cap, hd, ckv, tq, int8=False)
    kernel = functools.partial(
        _kernel_hg_v3, t=t, ckv=ckv, hg=hg, groups=groups, tq=tq,
        scale=1.0 / math.sqrt(hd),
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, k_cache, v_cache)
    return out.reshape(b, h, t, hd)


@functools.partial(jax.jit, static_argnames=("ckv", "tq", "hg_override"))
def _chunk_prefill_pallas_hg_v3_i8(q, kq, ks, vq, vs, start, ckv: int, tq: int = _V3_TQ, hg_override: int = 0):
    b, h, t, hd = q.shape
    kvh, c_cap = kq.shape[1], kq.shape[2]
    groups = h // kvh
    tq = min(tq, t)
    hg = hg_override or _pick_hg_v3(kvh, groups, t, hd, ckv, 1, tq)
    if hg == 0 or t % tq:
        raise ValueError(f"v3-i8 kernel needs t % tq == 0 and a VMEM-feasible hg (t={t}, tq={tq}, hg={hg})")
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _hg_v3_grid_spec(b, kvh, hg, groups, t, c_cap, hd, ckv, tq, int8=True)
    kernel = functools.partial(
        _kernel_hg_v3_i8, t=t, ckv=ckv, hg=hg, groups=groups, tq=tq,
        scale=1.0 / math.sqrt(hd),
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, kq, ks, vq, vs)
    return out.reshape(b, h, t, hd)


def _hg_v3_grid_spec(b, kvh, hg, groups, t, c_cap, hd, ckv, tq, int8):
    n_c = c_cap // ckv
    n_tiles = t // tq

    def q_map(bi, g, c, start):
        return (bi, g, 0, 0, 0)

    def kv_map(bi, g, c, start):
        last = (start[bi] + t - 1) // ckv
        return (bi, g, jnp.minimum(c, last), 0)

    def scale_map(bi, g, c, start):
        last = (start[bi] + t - 1) // ckv
        return (bi, g, 0, jnp.minimum(c, last))

    q_spec = pl.BlockSpec((1, hg, groups, t, hd), q_map, memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, hg, ckv, hd), kv_map, memory_space=pltpu.VMEM)
    if int8:
        sc_spec = pl.BlockSpec((1, hg, 1, ckv), scale_map, memory_space=pltpu.VMEM)
        in_specs = [q_spec, kv_spec, sc_spec, kv_spec, sc_spec]
    else:
        in_specs = [q_spec, kv_spec, kv_spec]
    # per-TILE scratch slabs (leading static index in the kernel's unrolled
    # q-tile loop — avoids lane/sublane shape casts on slices)
    rows = hg * groups * tq
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh // hg, n_c),
        in_specs=in_specs,
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((n_tiles, rows, 1), jnp.float32),
            pltpu.VMEM((n_tiles, rows, 1), jnp.float32),
            pltpu.VMEM((n_tiles, rows, hd), jnp.float32),
        ],
    )


def _pick_hg(kvh: int, groups: int, t: int, hd: int, ckv: int, kv_itemsize: int) -> int:
    """Largest kv-head group whose working set fits a ~7 MB VMEM budget.

    Estimate per program: q + o (bf16, resident) + double-buffered K/V chunks
    + f32 softmax state + the (hg, groups*t, ckv) f32 logits intermediates —
    TWO of them on the int8 path (kv_itemsize == 1), which materializes both
    ``p`` and the V-scale-folded ``p·s`` (the hg=4 int8 variant measured a
    16.6 MB scoped-vmem stack against the 16 MB limit at t=1024)."""
    budget = 7 * 1024 * 1024
    n_logits = 2 if kv_itemsize == 1 else 1
    for hg in (8, 4, 2, 1):
        if kvh % hg != 0:
            continue
        r = groups * t
        est = (
            2 * hg * r * hd * 2  # q + o, bf16
            + 2 * 2 * hg * ckv * hd * kv_itemsize  # K/V double-buffered
            + hg * r * (hd + 2) * 4  # acc + m + l, f32
            + n_logits * hg * r * ckv * 4  # logits intermediates, f32
        )
        if est <= budget:
            return hg
    # Even hg=1 busts the budget (high-GQA configs: the resident q/o tile is
    # groups*t rows regardless of hg).  Signal failure — the dispatchers
    # route to the per-q-tile tiled kernel instead of compiling a kernel
    # whose scoped-vmem stack exceeds the 16 MB cap (ADVICE r4).
    return 0


def _hg_grid_spec(b, kvh, hg, groups, t, c_cap, hd, ckv, int8):
    n_c = c_cap // ckv

    def q_map(bi, g, c, start):
        return (bi, g, 0, 0, 0)

    def kv_map(bi, g, c, start):
        last = (start[bi] + t - 1) // ckv
        return (bi, g, jnp.minimum(c, last), 0)

    def scale_map(bi, g, c, start):
        last = (start[bi] + t - 1) // ckv
        return (bi, g, 0, jnp.minimum(c, last))

    q_spec = pl.BlockSpec((1, hg, groups, t, hd), q_map, memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, hg, ckv, hd), kv_map, memory_space=pltpu.VMEM)
    if int8:
        sc_spec = pl.BlockSpec((1, hg, 1, ckv), scale_map, memory_space=pltpu.VMEM)
        in_specs = [q_spec, kv_spec, sc_spec, kv_spec, sc_spec]
    else:
        in_specs = [q_spec, kv_spec, kv_spec]
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh // hg, n_c),
        in_specs=in_specs,
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((hg * groups * t, 1), jnp.float32),
            pltpu.VMEM((hg * groups * t, 1), jnp.float32),
            pltpu.VMEM((hg * groups * t, hd), jnp.float32),
        ],
    )


@functools.partial(jax.jit, static_argnames=("ckv",))
def _chunk_prefill_pallas_hg(q, k_cache, v_cache, start, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = k_cache.shape[1], k_cache.shape[2]
    groups = h // kvh
    hg = _pick_hg(kvh, groups, t, hd, ckv, kv_itemsize=2)
    if hg == 0:
        raise ValueError(
            f"hg kernel working set exceeds VMEM even at hg=1 "
            f"(groups={groups}, t={t}) — use the tiled kernel (impl='pallas_tiled')"
        )
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _hg_grid_spec(b, kvh, hg, groups, t, c_cap, hd, ckv, int8=False)
    kernel = functools.partial(
        _kernel_hg, t=t, ckv=ckv, hg=hg, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, k_cache, v_cache)
    return out.reshape(b, h, t, hd)


@functools.partial(jax.jit, static_argnames=("ckv",))
def _chunk_prefill_pallas_hg_i8(q, kq, ks, vq, vs, start, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = kq.shape[1], kq.shape[2]
    groups = h // kvh
    hg = _pick_hg(kvh, groups, t, hd, ckv, kv_itemsize=1)
    if hg == 0:
        raise ValueError(
            f"hg-i8 kernel working set exceeds VMEM even at hg=1 "
            f"(groups={groups}, t={t}) — use the tiled kernel (impl='pallas_tiled')"
        )
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _hg_grid_spec(b, kvh, hg, groups, t, c_cap, hd, ckv, int8=True)
    kernel = functools.partial(
        _kernel_hg_i8, t=t, ckv=ckv, hg=hg, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, kq, ks, vq, vs)
    return out.reshape(b, h, t, hd)


def _grid_spec(b, kvh, groups, t, c_cap, hd, tq, ckv, int8):
    n_q = t // tq
    n_c = c_cap // ckv

    def q_map(bi, kh, qb, c, start):
        return (bi, kh, 0, qb, 0)

    def kv_map(bi, kh, qb, c, start):
        # clamp dead chunks to the last live one -> repeated block index ->
        # Pallas skips the DMA; reads scale with live length, not capacity
        last = (start[bi] + (qb + 1) * tq - 1) // ckv
        return (bi, kh, jnp.minimum(c, last), 0)

    def scale_map(bi, kh, qb, c, start):
        last = (start[bi] + (qb + 1) * tq - 1) // ckv
        return (bi, kh, 0, jnp.minimum(c, last))

    kv_spec = pl.BlockSpec((1, 1, ckv, hd), kv_map, memory_space=pltpu.VMEM)
    if int8:
        sc_spec = pl.BlockSpec((1, 1, 1, ckv), scale_map, memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((1, 1, groups, tq, hd), q_map, memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
        ]
    else:
        in_specs = [
            pl.BlockSpec((1, 1, groups, tq, hd), q_map, memory_space=pltpu.VMEM),
            kv_spec, kv_spec,
        ]
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh, n_q, n_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, groups, tq, hd), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((groups * tq, 1), jnp.float32),
            pltpu.VMEM((groups * tq, 1), jnp.float32),
            pltpu.VMEM((groups * tq, hd), jnp.float32),
        ],
    )


@functools.partial(jax.jit, static_argnames=("tq", "ckv"))
def _chunk_prefill_pallas(q, k_cache, v_cache, start, tq: int, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = k_cache.shape[1], k_cache.shape[2]
    groups = h // kvh
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _grid_spec(b, kvh, groups, t, c_cap, hd, tq, ckv, int8=False)
    kernel = functools.partial(
        _kernel, tq=tq, ckv=ckv, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, k_cache, v_cache)
    return out.reshape(b, h, t, hd)


@functools.partial(jax.jit, static_argnames=("tq", "ckv"))
def _chunk_prefill_pallas_i8(q, kq, ks, vq, vs, start, tq: int, ckv: int):
    b, h, t, hd = q.shape
    kvh, c_cap = kq.shape[1], kq.shape[2]
    groups = h // kvh
    q5 = q.reshape(b, kvh, groups, t, hd)
    grid_spec = _grid_spec(b, kvh, groups, t, c_cap, hd, tq, ckv, int8=True)
    kernel = functools.partial(
        _kernel_i8, tq=tq, ckv=ckv, groups=groups, scale=1.0 / math.sqrt(hd)
    )
    start_vec = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_vec, q5, kq, ks, vq, vs)
    return out.reshape(b, h, t, hd)


def _xla_fallback(q, k, v, start):
    """Masked dense attention over the whole capacity (the pre-kernel path)."""
    b, h, t, hd = q.shape
    kvh = k.shape[1]
    groups = h // kvh
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if groups > 1:
        kf = jnp.repeat(kf, groups, axis=1)
        vf = jnp.repeat(vf, groups, axis=1)
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q.astype(jnp.float32), kf,
        preferred_element_type=jnp.float32,
    ) / math.sqrt(hd)
    q_pos = jnp.asarray(start, jnp.int32).reshape(-1, 1, 1, 1) + jnp.arange(t)[None, None, :, None]
    kv_pos = jnp.arange(k.shape[2])[None, None, None, :]
    logits = jnp.where(kv_pos <= q_pos, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, vf).astype(q.dtype)


def _shapes_ok(t, c_cap, tq, ckv):
    return t % tq == 0 and c_cap % ckv == 0 and c_cap >= ckv


def _pad_q(q, tq):
    """Pad the query tile dim up to a multiple of ``tq``.

    Pad rows sit at positions AFTER every real row; they may attend garbage
    cache slots beyond the written region, but q rows are independent in
    attention, so garbage stays confined to rows the caller slices off.
    The waste is MXU-only (the KV stream is shared across the tile), which
    is why small-T cached attention (speculative verify windows, short
    suffixes) is still far cheaper here than dense full-capacity attention."""
    t = q.shape[2]
    tp = -(-t // tq) * tq
    if tp == t:
        return q, t
    return jnp.pad(q, ((0, 0), (0, 0), (0, tp - t), (0, 0))), t


def chunk_prefill_attention(
    q, k_cache, v_cache, start, *, tq: int = 128, ckv: int = 256, impl: str = "auto"
):
    """Prefill-chunk attention against a bf16/f32 fixed-capacity cache.

    Args:
      q: (B, H, T, hd) rotary-embedded queries at global positions
        ``[start, start + T)``; T is padded to the 128-row tile internally.
      k_cache/v_cache: (B, KVH, C, hd) with the chunk's K/V already written
        at ``[start, start + T)``.
      start: scalar or (B,) int32 — global position of the chunk's first row.

    Returns (B, H, T, hd)."""
    t, c_cap = q.shape[2], k_cache.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    cap_ok = c_cap % ckv == 0 and c_cap >= ckv
    use_pallas = cap_ok and (
        impl in ("pallas", "pallas_tiled", "pallas_v3")
        or (impl == "auto" and on_tpu)
    )
    if impl in ("pallas", "pallas_tiled", "pallas_v3") and not cap_ok:
        raise ValueError(
            f"chunk_prefill_attention pallas needs C % {ckv} == 0, got C={c_cap}"
        )
    if not use_pallas:
        return _xla_fallback(q, k_cache, v_cache, start)
    if t <= _SMALL_T:
        qp, t = _pad_q(q, _SMALL_T)
        out = _chunk_prefill_pallas_small(
            qp, k_cache, v_cache, jnp.asarray(start), _SMALL_T, ckv
        )
        return out[:, :, :t]
    kvh = k_cache.shape[1]
    if impl == "pallas_v3" or (impl == "auto" and _SMALL_T < t <= _V3_MAX_T):
        # round-5 q-tile-loop kernel: tile-bounded intermediates let the
        # kv-chunk grow to the MXU-efficient size and compile t=2048
        ckv3 = _pick_v3_ckv(c_cap) or ckv
        tqq, hg = _pick_v3_tile(kvh, q.shape[1] // kvh, t, q.shape[3], ckv3, 2)
        if hg > 0:
            qp, t = _pad_q(q, tqq)
            out = _chunk_prefill_pallas_hg_v3(
                qp, k_cache, v_cache, jnp.asarray(start), ckv3, tqq
            )
            return out[:, :, :t]
        if impl == "pallas_v3":
            raise ValueError(
                f"v3 kernel working set exceeds VMEM (t={t}, groups={q.shape[1] // kvh})"
            )
    tp_pad = -(-t // tq) * tq
    hg = _pick_hg(kvh, q.shape[1] // kvh, tp_pad, q.shape[3], ckv, kv_itemsize=2)
    if impl == "pallas_tiled" or t > _HG_MAX_T or hg == 0:
        # round-3 per-q-tile kernel: kept for A/Bs, and the fallback for
        # t > 1024 — or any (groups, t) whose resident q/o tile busts the
        # VMEM budget even at hg=1 — where the hg kernel's whole-chunk tile
        # blows the 16 MB scoped-vmem stack (measured at t=2048)
        qp, t = _pad_q(q, tq)
        out = _chunk_prefill_pallas(qp, k_cache, v_cache, jnp.asarray(start), tq, ckv)
        return out[:, :, :t]
    qp, t = _pad_q(q, tq)
    out = _chunk_prefill_pallas_hg(qp, k_cache, v_cache, jnp.asarray(start), ckv)
    return out[:, :, :t]


def chunk_prefill_attention_tmajor(
    q, k_t, v_t, start, *, ckv: int = 256, impl: str = "auto"
):
    """Small-T cached attention on a T-MAJOR bf16 cache (B, KVH, hd, C) —
    the speculative k+1-token verify window on long-context engines.  T is
    capped at ``_SMALL_T`` (prefill-sized chunks must run row-major; the
    engine's admission path does)."""
    t, c_cap = q.shape[2], k_t.shape[3]
    if t > _SMALL_T:
        raise NotImplementedError(
            f"T-major cached attention supports verify windows up to "
            f"{_SMALL_T} tokens, got t={t}; run prefill row-major"
        )
    on_tpu = jax.default_backend() == "tpu"
    cap_ok = c_cap % ckv == 0 and c_cap >= ckv
    use_pallas = cap_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if impl == "pallas" and not cap_ok:
        raise ValueError(
            f"chunk_prefill_attention_tmajor pallas needs C % {ckv} == 0, got C={c_cap}"
        )
    if not use_pallas:
        return _xla_fallback(
            q, k_t.transpose(0, 1, 3, 2), v_t.transpose(0, 1, 3, 2), start
        )
    qp, t = _pad_q(q, _SMALL_T)
    out = _chunk_prefill_pallas_small_tmajor(qp, k_t, v_t, jnp.asarray(start), _SMALL_T, ckv)
    return out[:, :, :t]


def chunk_prefill_attention_tmajor_int8(
    q, kq, ks, vq, vs, start, *, ckv: int = 256, impl: str = "auto"
):
    """int8 T-major variant: codes (B, KVH, hd, C), scales lane-major
    (B, KVH, 1, C) — identical to the row-major int8 scales."""
    t, c_cap = q.shape[2], kq.shape[3]
    if t > _SMALL_T:
        raise NotImplementedError(
            f"T-major cached attention supports verify windows up to "
            f"{_SMALL_T} tokens, got t={t}; run prefill row-major"
        )
    on_tpu = jax.default_backend() == "tpu"
    cap_ok = c_cap % ckv == 0 and c_cap >= ckv
    use_pallas = cap_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if impl == "pallas" and not cap_ok:
        raise ValueError(
            f"chunk_prefill_attention_tmajor_int8 pallas needs C % {ckv} == 0, got C={c_cap}"
        )
    if not use_pallas:
        ks_t = ks.transpose(0, 1, 3, 2).astype(jnp.float32)
        vs_t = vs.transpose(0, 1, 3, 2).astype(jnp.float32)
        k = (kq.transpose(0, 1, 3, 2).astype(jnp.float32) * ks_t).astype(q.dtype)
        v = (vq.transpose(0, 1, 3, 2).astype(jnp.float32) * vs_t).astype(q.dtype)
        return _xla_fallback(q, k, v, start)
    qp, t = _pad_q(q, _SMALL_T)
    out = _chunk_prefill_pallas_small_tmajor_i8(
        qp, kq, ks, vq, vs, jnp.asarray(start), _SMALL_T, ckv
    )
    return out[:, :, :t]


def chunk_prefill_attention_int8(
    q, kq, ks, vq, vs, start, *, tq: int = 128, ckv: int = 256, impl: str = "auto"
):
    """int8-cache variant (``phi.init_cache(..., "int8")`` layout: codes
    (B, KVH, C, hd), scales lane-major (B, KVH, 1, C))."""
    t, c_cap = q.shape[2], kq.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    cap_ok = c_cap % ckv == 0 and c_cap >= ckv
    use_pallas = cap_ok and (
        impl in ("pallas", "pallas_tiled", "pallas_v3")
        or (impl == "auto" and on_tpu)
    )
    if impl in ("pallas", "pallas_tiled", "pallas_v3") and not cap_ok:
        raise ValueError(
            f"chunk_prefill_attention_int8 pallas needs C % {ckv} == 0, got C={c_cap}"
        )
    if not use_pallas:
        ks_t = ks.transpose(0, 1, 3, 2).astype(jnp.float32)
        vs_t = vs.transpose(0, 1, 3, 2).astype(jnp.float32)
        k = (kq.astype(jnp.float32) * ks_t).astype(q.dtype)
        v = (vq.astype(jnp.float32) * vs_t).astype(q.dtype)
        return _xla_fallback(q, k, v, start)
    if t <= _SMALL_T:
        qp, t = _pad_q(q, _SMALL_T)
        out = _chunk_prefill_pallas_small_i8(
            qp, kq, ks, vq, vs, jnp.asarray(start), _SMALL_T, ckv
        )
        return out[:, :, :t]
    kvh = kq.shape[1]
    if impl == "pallas_v3" or (impl == "auto" and _SMALL_T < t <= _V3_MAX_T):
        ckv3 = _pick_v3_ckv(c_cap) or ckv
        tqq, hg = _pick_v3_tile(kvh, q.shape[1] // kvh, t, q.shape[3], ckv3, 1)
        if hg > 0:
            qp, t = _pad_q(q, tqq)
            out = _chunk_prefill_pallas_hg_v3_i8(
                qp, kq, ks, vq, vs, jnp.asarray(start), ckv3, tqq
            )
            return out[:, :, :t]
        if impl == "pallas_v3":
            raise ValueError(
                f"v3-i8 kernel working set exceeds VMEM (t={t}, groups={q.shape[1] // kvh})"
            )
    tp_pad = -(-t // tq) * tq
    hg = _pick_hg(kvh, q.shape[1] // kvh, tp_pad, q.shape[3], ckv, kv_itemsize=1)
    if impl == "pallas_tiled" or t > _HG_MAX_T or hg == 0:
        qp, t = _pad_q(q, tq)
        out = _chunk_prefill_pallas_i8(qp, kq, ks, vq, vs, jnp.asarray(start), tq, ckv)
        return out[:, :, :t]
    qp, t = _pad_q(q, tq)
    out = _chunk_prefill_pallas_hg_i8(qp, kq, ks, vq, vs, jnp.asarray(start), ckv)
    return out[:, :, :t]
