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
    return 1


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
        impl in ("pallas", "pallas_tiled") or (impl == "auto" and on_tpu)
    )
    if impl in ("pallas", "pallas_tiled") and not cap_ok:
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
    if impl == "pallas_tiled" or t > _HG_MAX_T:
        # round-3 per-q-tile kernel: kept for A/Bs, and the fallback for
        # t > 1024 where the hg kernel's whole-chunk tile blows the 16 MB
        # scoped-vmem stack (measured at t=2048 even with hg=1)
        qp, t = _pad_q(q, tq)
        out = _chunk_prefill_pallas(qp, k_cache, v_cache, jnp.asarray(start), tq, ckv)
        return out[:, :, :t]
    qp, t = _pad_q(q, tq)
    out = _chunk_prefill_pallas_hg(qp, k_cache, v_cache, jnp.asarray(start), ckv)
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
        impl in ("pallas", "pallas_tiled") or (impl == "auto" and on_tpu)
    )
    if impl in ("pallas", "pallas_tiled") and not cap_ok:
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
    if impl == "pallas_tiled" or t > _HG_MAX_T:
        qp, t = _pad_q(q, tq)
        out = _chunk_prefill_pallas_i8(qp, kq, ks, vq, vs, jnp.asarray(start), tq, ckv)
        return out[:, :, :t]
    qp, t = _pad_q(q, tq)
    out = _chunk_prefill_pallas_hg_i8(qp, kq, ks, vq, vs, jnp.asarray(start), ckv)
    return out[:, :, :t]
