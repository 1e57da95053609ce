"""Single-dispatch decode layer tail: attention + the dual out2 matmul.

Merges :func:`ternary_vllm_tpu.ops.fused_decode_attention.fused_decode_attention`
(rope + KV-cache write + online-softmax flash attention) into
:func:`ternary_vllm_tpu.ops.ternary_matmul.dual_ternary_matmul` (the fused
``out_proj``/``fc2`` w2a8 kernel with residual epilogue), so the per-layer
decode path [in_proj] -> [attention] -> [out2] becomes TWO Pallas dispatches
instead of three.

Motivation (DESIGN.md §6, round-5 7B trace): at batch-1 decode the attention
kernel's ~8 us/layer is almost entirely dispatch + pipeline-ramp fixed cost
(its HBM traffic at short live lengths is ~2 us), and it sits serially
between two matmul kernels.  Folding it into the dual kernel's grid hides the
attention chunk streaming behind the weight-block DMA pipeline and removes
the XLA glue (attn reshape/copy, activation re-quantization) between the ops.

Design notes (what Mosaic allows shaped this):

* The dual matmul's activation row for the attn half cannot exist as a
  ``(1, d)`` lane vector — Mosaic cannot shape-cast the attention output's
  ``(h, hd)`` sublanes into lanes, and sublane loads must be 8-aligned.
  The attn half therefore stays 2-D in an f32 scratch (int8-valued; int8
  vectors cannot take unit-dim inserts either), the wrapper splits the
  out_proj contraction into ``n_a = s1/bs`` TAIL k-cells whose head-row
  offsets are all static, and each sub-step contracts with head-row-batched
  ``(rows, 1, hd) x (rows, hd, bn)`` MXU dots.
* Manual ``make_async_copy`` chunk streaming breaks on the lane-PADDED
  row-major cache layout at ``hd=64`` (memref slices must be 128-aligned on
  the last dim), so KV chunks ride the AUTOMATIC BlockSpec pipeline instead:
  attention is processed incrementally, one clamped KV chunk per grid cell
  along the k dimension of the ``j == 0`` row (online-softmax state in
  scratch), exactly like the standalone kernel's chunk grid.  The wrapper
  picks ``bs`` so ``n_kt >= cap/chunk`` (every chunk gets a cell, no idle
  matmul cells); B (fc2) steps ride the early cells with their weight-block
  index map shifted by ``n_a``, attention finalizes + quantizes in cell
  ``n_k - n_a``, and the A sub-steps close the accumulation.
* RoPE is applied in-cell-0; the new token's K/V enters the softmax from
  registers at chunk ``last``; the 8-row aligned cache window around slot
  ``pos`` is flushed once through input/output-aliased block outputs (index
  map constant over the grid), all identical to the standalone kernel.
* The decisive perf lever was none of the above: an ablation sweep (see
  ``examples/ablate_attn_dual.py`` and DESIGN.md §6 round-5) pinned the
  kernel's overhead on per-cell scalar BOOKKEEPING for its ~17 operand
  streams — ``bn`` is therefore the largest VMEM-fitting divisor of N
  (fewest grid cells), which took the kernel from 50 to 34.9 us/layer at
  7B shapes vs 37.0 for the composed pair.

Numerics match the composed pair bit-for-bit (same f32 op sequence; the
attention output round-trips through bf16 at the old kernel boundary before
int8 quantization).  :func:`attn_dual_decode` falls back to composing the two
existing ops for shapes/modes the merged kernel does not cover (batch > 1,
int8 or T-major caches, non-dividing block shapes, off-TPU).

Reference parity anchor: the reference runs attention and projections as
separate framework ops per decode step (``impl/tf/moondream/layers.py``,
no decode-path fusion at all); this is the TPU-native answer to its serving
loop's per-op overhead.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ternary_vllm_tpu.ops.fused_decode_attention import _rope_2d
from ternary_vllm_tpu.ops.ternary_matmul import _num_planes, _on_tpu

NEG_INF = float(-1e30)


def _attn_dual_kernel(
    # prefetch
    pos_ref,
    # inputs
    q_ref, kn_ref, vn_ref, cos_ref, sin_ref, kc_ref, vc_ref,
    x2_ref, p_ref, s1_ref, b1_ref, s2_ref, b2_ref, r_ref,
    # outputs
    o_ref, ko_ref, vo_ref,
    # scratch
    qs_ref, ksn_ref, m_ref, l_ref, accA_ref, xqa_ref, xqm_ref,
    xs1_ref, xs2_ref, rs1_ref, rs2_ref, acc1_ref, acc2_ref,
    *, s1, s2, bs, bn, n_kt, n_k, chunk, groups, scale, rotary_dim, clip_val,
    mode, ablate=0,
):
    j = pl.program_id(0)
    kt = pl.program_id(1)
    planes = _num_planes(mode)
    bits = 2 if mode == "ternary" else 1
    lane_mask = 0x03030303 if bits == 2 else 0x01010101
    pos = pos_ref[0]
    last = pos // chunk
    n_a = s1 // bs  # A (out_proj) sub-steps, at the tail cells
    n_b = n_kt - n_a

    # ---------------- attention: one clamped KV chunk per k cell ----------
    @pl.when(jnp.logical_and(j == 0, kt == 0))
    def _():
        cos = cos_ref[0].astype(jnp.float32)  # (1, rd)
        sin = sin_ref[0].astype(jnp.float32)
        qs_ref[:] = _rope_2d(q_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        ksn_ref[:] = _rope_2d(kn_ref[0].astype(jnp.float32), cos, sin, rotary_dim)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        accA_ref[:] = jnp.zeros_like(accA_ref)

        # mlp-half quantize must happen BEFORE any B matmul step (the j == 0
        # B steps run in cells (0, 0..n_kt-2), ahead of the attention
        # finalize cell)
        row2 = x2_ref[:].astype(jnp.float32)
        amax2 = jnp.max(jnp.abs(row2), axis=1, keepdims=True)
        xs2 = jnp.maximum(amax2, 1e-6) * (1.0 / 127.0)
        q2 = jnp.clip(jnp.round(row2 / xs2), -127, 127).astype(jnp.int8)
        xqm_ref[:] = q2
        xs2_ref[:] = xs2
        if mode != "binary01":
            rs2_ref[:] = jnp.sum(q2.astype(jnp.int32), axis=(0, 1), keepdims=True)

    @pl.when(jnp.logical_and(j == 0, jnp.logical_and(kt <= last, not (ablate & 1))))
    def _():
        if ablate & 1:  # static skip: body must not trace against tiny kv blocks
            return
        h, hd = q_ref.shape[1], q_ref.shape[2]
        kvh = kc_ref.shape[1]
        qf = qs_ref[:].reshape(kvh, groups, hd)
        k = kc_ref[0].astype(jnp.float32)  # (kvh, chunk, hd)
        v = vc_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qf, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        logits = logits.reshape(h, chunk)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + kt * chunk
        # strictly BELOW pos: slot pos may hold stale data — the new token's
        # contribution enters from registers at chunk `last`
        logits = jnp.where(idx < pos, logits, NEG_INF)

        is_last = kt == last
        ks = ksn_ref[:]
        lnew = jnp.sum(qf * ks[:, None, :], axis=2).reshape(h, 1) * scale
        lnew = jnp.where(is_last, lnew, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(
            m_prev, jnp.maximum(jnp.max(logits, axis=1, keepdims=True), lnew)
        )
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        p_new = jnp.exp(lnew - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True) + p_new
        pv = jax.lax.dot_general(
            p.reshape(kvh, groups, chunk), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(h, hd)
        vn = vn_ref[0].astype(jnp.float32)  # (kvh, hd)
        vn_h = jnp.broadcast_to(vn[:, None, :], (kvh, groups, hd)).reshape(h, hd)
        accA_ref[:] = accA_ref[:] * corr + pv + p_new * vn_h
        m_ref[:] = m_new

    # --- finalize: cache flush + attn quantize (cell n_k - n_a, j = 0) ----
    # must precede the FIRST A sub-step, which runs later in this same cell
    # (in-kernel code order); merged_ok guarantees last <= n_k - n_a so the
    # kv block here is the clamped chunk `last` and attention is complete
    @pl.when(jnp.logical_and(j == 0, jnp.logical_and(kt == n_k - n_a, bool(ablate & 2))))
    def _():
        xqa_ref[:] = jnp.zeros_like(xqa_ref)
        xs1_ref[:] = jnp.full((1, 1), 1.0, jnp.float32)
        rs1_ref[:] = jnp.zeros_like(rs1_ref)

    @pl.when(jnp.logical_and(j == 0, jnp.logical_and(kt == n_k - n_a, not (ablate & 2))))
    def _():
        if ablate & 2:  # static skip
            return
        kvh = kc_ref.shape[1]
        # cache write: the kv block here is the clamped chunk `last`; the
        # 8-row aligned window around slot pos is selected in f32 and flushed
        # once via the constant-index aliased output blocks
        win = (pos // 8) * 8
        w_off = pl.multiple_of(win - last * chunk, 8)
        r = pos - win
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r
        kwin = kc_ref[0, :, pl.ds(w_off, 8), :].astype(jnp.float32)
        vwin = vc_ref[0, :, pl.ds(w_off, 8), :].astype(jnp.float32)
        vn = vn_ref[0].astype(jnp.float32)
        kn3 = ksn_ref[:][:, None, :]  # f32 (kvh, 1, hd), rotated
        ko_ref[0] = jnp.where(rowsel[None], kn3, kwin).astype(ko_ref.dtype)
        vo_ref[0] = jnp.where(rowsel[None], vn[:, None, :], vwin).astype(vo_ref.dtype)

        # attention output -> bf16 round trip (kernel-boundary parity with
        # the composed pair) -> int8 quantize.  Attn half stays (h, hd) in
        # scratch; mlp half quantizes from the x2 operand; epilogue rowsums
        # are computed ONCE here (the standalone dual kernel recomputes them
        # per N-block).
        attn = (accA_ref[:] / l_ref[:]).astype(o_ref.dtype).astype(jnp.float32)
        amax1 = jnp.max(jnp.abs(attn))
        xs1 = jnp.maximum(amax1, 1e-6) * (1.0 / 127.0)
        # int8-quantized VALUES kept in f32 (exact for |v| <= 127): Mosaic
        # cannot insert unit dims on int8 vectors, so the A matmul expands in
        # f32 and casts to int8 afterwards
        q1 = jnp.clip(jnp.round(attn / xs1), -127, 127)
        xqa_ref[:] = q1
        xs1_ref[:] = jnp.full((1, 1), xs1, jnp.float32)
        if mode != "binary01":
            rs1_ref[:] = jnp.sum(q1, axis=(0, 1), keepdims=True).astype(jnp.int32)

    # ---------------- dual w2a8 matmul ------------------------------------
    @pl.when(kt == 0)
    def _():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    w32 = pltpu.bitcast(p_ref[:], jnp.int32)  # (bs/4, bn)

    # B (fc2) k-steps ride cells 0..n_b-1 with the weight map shifted by n_a
    @pl.when(kt < n_b)
    def _():
        acc = acc2_ref[:]
        for t in range(planes):
            sh = w32 >> (bits * t) if t else w32
            c8 = pltpu.bitcast(sh & lane_mask, jnp.int8)
            xs = xqm_ref[:, pl.ds(pl.multiple_of(t * s2 + kt * bs, 128), bs)]
            acc = acc + jax.lax.dot_general(
                xs, c8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        acc2_ref[:] = acc

    # A (out_proj) sub-steps in the LAST n_a cells; the finalize block above
    # writes xqa in cell n_k - n_a, before sub-step 0's code in that cell.
    # x lives as (h, hd) int8 — Mosaic cannot shape-cast sublanes into lanes
    # and sublane loads must be 8-aligned, so the (1, bs) row-vector form of
    # the dual kernel is unreachable; splitting A on bs boundaries keeps
    # every plane's head-row offset STATIC and the contraction unrolls into
    # per-head-row (1, hd) x (hd, bn) MXU dots (same int8 MXU work).
    hd = xqa_ref.shape[1]
    rows_pb = bs // hd  # head rows per plane per A sub-step
    for a in range(n_a):
        @pl.when(kt == n_k - n_a + a)
        def _(a=a):
            xv = xqa_ref[:]  # (h, hd) f32 holding int8 values
            acc = acc1_ref[:]
            for t in range(planes):
                sh = w32 >> (bits * t) if t else w32
                c8 = pltpu.bitcast(sh & lane_mask, jnp.int8)  # (bs, bn)
                r0 = (t * s1 + a * bs) // hd
                # head-row-batched dot: x (rows, 1, hd) . w (rows, hd, bn)
                # summed over the batch — avoids per-row int8 sublane
                # extracts (expensive relayouts)
                if ablate & 4:  # timing-only: flat dot from the mlp scratch
                    xs_ = xqm_ref[:, pl.ds(pl.multiple_of(t * bs, 128), bs)]
                    acc = acc + jax.lax.dot_general(
                        xs_, c8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                else:
                    x3 = xv[r0:r0 + rows_pb][:, None, :].astype(jnp.int8)
                    w3 = c8.reshape(rows_pb, hd, bn)
                    prod = jax.lax.dot_general(
                        x3, w3, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )  # (rows_pb, 1, bn)
                    acc = acc + jnp.sum(prod, axis=0)
            acc1_ref[:] = acc

    @pl.when(kt == n_k - 1)
    def _():
        acc1 = acc1_ref[:]
        acc2 = acc2_ref[:]
        if mode != "binary01":
            rs1 = rs1_ref[:]
            rs2 = rs2_ref[:]
            if mode == "binary":
                acc1 = 2 * acc1 - rs1
                acc2 = 2 * acc2 - rs2
            else:
                acc1 = acc1 - rs1
                acc2 = acc2 - rs2
        y1 = acc1.astype(jnp.float32) * xs1_ref[:] * s1_ref[:] + b1_ref[:]
        y2 = acc2.astype(jnp.float32) * xs2_ref[:] * s2_ref[:] + b2_ref[:]
        if clip_val is not None:
            y1 = jnp.clip(y1, -abs(clip_val), abs(clip_val))
            y2 = jnp.clip(y2, -abs(clip_val), abs(clip_val))
        out = (y1 + y2).astype(o_ref.dtype)
        o_ref[:] = out + r_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "s1", "rotary_dim", "chunk", "clip_val", "mode", "bs", "bn", "out_dtype",
        "ablate", "sem0",
    ),
)
def _attn_dual_pallas(
    q, k_new, v_new, cos, sin, k_cache, v_cache, pos, x2,
    packed, scale1, bias1, scale2, bias2, residual,
    *, s1, rotary_dim, chunk, clip_val, mode, bs, bn, out_dtype,
    ablate=0, sem0="arbitrary",
):
    b, h, hd = q.shape
    _, kvh, cap, _ = k_cache.shape
    groups = h // kvh
    planes = _num_planes(mode)
    s_tot, n = packed.shape
    s2 = s_tot - s1
    k2 = planes * s2
    n_kt = s_tot // bs
    n_a = s1 // bs
    n_b = n_kt - n_a
    n_k = n_kt  # merged_ok guarantees cap // chunk <= n_kt (no idle cells)
    scale = 1.0 / math.sqrt(hd)

    kernel = functools.partial(
        _attn_dual_kernel,
        s1=s1, s2=s2, bs=bs, bn=bn, n_kt=n_kt, n_k=n_k, chunk=chunk,
        groups=groups, scale=scale, rotary_dim=rotary_dim, clip_val=clip_val,
        mode=mode, ablate=ablate,
    )

    def const(j, k, pos):
        return (0, 0, 0)

    def kv_map(j, k, pos):
        # j == 0 walks the live chunks (clamped); j > 0 parks on the last
        # live chunk (revisit -> no DMA)
        if ablate & 32:
            return (0, 0, 0, 0)
        return (0, 0, jnp.where(j == 0, jnp.minimum(k, pos[0] // chunk),
                                pos[0] // chunk), 0)

    def w_map(j, k, pos):
        # B blocks n_a..n_kt-1 ride cells 0..n_b-1; the A blocks 0..n_a-1
        # load for the tail cells
        if ablate & 32:
            return (k, j)
        return (jnp.where(k < n_b, k + n_a, k - n_b), j)

    def out_row_map(j, k, pos):
        if ablate & 32:
            return (0, 0, 0, 0)
        return (0, 0, pos[0] // 8, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((1, h, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rotary_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 8 if ablate & 8 else chunk, hd),
                         (lambda j, k, pos: (0, 0, 0, 0)) if ablate & 8 else kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 8 if ablate & 8 else chunk, hd),
                         (lambda j, k, pos: (0, 0, 0, 0)) if ablate & 8 else kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2), lambda j, k, pos: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, bn), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, k, pos: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, k, pos: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, k, pos: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, k, pos: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, k, pos: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn), lambda j, k, pos: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 8, hd),
                         (lambda j, k, pos: (0, 0, 0, 0)) if ablate & 16 else out_row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 8, hd),
                         (lambda j, k, pos: (0, 0, 0, 0)) if ablate & 16 else out_row_map,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, hd), jnp.float32),      # rotated q
            pltpu.VMEM((kvh, hd), jnp.float32),    # rotated k_new
            pltpu.VMEM((h, 1), jnp.float32),       # m
            pltpu.VMEM((h, 1), jnp.float32),       # l
            pltpu.VMEM((h, hd), jnp.float32),      # attention acc
            pltpu.VMEM((h, hd), jnp.float32),      # xq attn half (int8 values)
            pltpu.VMEM((1, k2), jnp.int8),         # xq mlp half
            pltpu.VMEM((1, 1), jnp.float32),       # xs1
            pltpu.VMEM((1, 1), jnp.float32),       # xs2
            pltpu.VMEM((1, 1), jnp.int32),         # rowsum attn
            pltpu.VMEM((1, 1), jnp.int32),         # rowsum mlp
            pltpu.VMEM((1, bn), jnp.int32),        # acc1
            pltpu.VMEM((1, bn), jnp.int32),        # acc2
        ],
    )
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), out_dtype),
            jax.ShapeDtypeStruct((1, kvh, 8, hd) if ablate & 16 else k_cache.shape,
                                 k_cache.dtype),
            jax.ShapeDtypeStruct((1, kvh, 8, hd) if ablate & 16 else v_cache.shape,
                                 v_cache.dtype),
        ],
        # inputs counted incl. the scalar-prefetch arg: pos=0, q=1, kn=2,
        # vn=3, cos=4, sin=5, k_cache=6, v_cache=7, x2=8, packed=9, ...
        input_output_aliases={} if ablate & 16 else {6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(sem0, "arbitrary"),
        ),
    )(
        pos_vec, q, k_new, v_new, cos[:, None, :], sin[:, None, :],
        k_cache, v_cache, x2, packed, scale1, bias1, scale2, bias2, residual,
    )


def _pick_bs(s1, s2, n_chunks):
    """Largest weight k-block that divides both halves AND yields at least
    one matmul k-step per KV chunk (n_kt >= n_chunks keeps the grid free of
    idle matmul cells), with attention + finalize complete before the first
    A sub-step cell."""
    for bs in (512, 256, 128):
        if s1 % bs or s2 % bs:
            continue
        n_kt = (s1 + s2) // bs
        n_a = s1 // bs
        if n_kt >= n_chunks and n_chunks - 1 <= n_kt - n_a:
            return bs
    return None


def attn_dual_decode(
    q, k_new, v_new, cos, sin, k_cache, v_cache, pos, x2,
    packed_stacked, s1: int, scale1, bias1, scale2, bias2, residual,
    *, rotary_dim: int, clip_val: Optional[float], mode: str = "ternary",
):
    """Fused decode-step ``attention -> out2(dual) + residual``.

    Semantics (bit-exact with the composed pair):

        attn, k', v' = fused_decode_attention(q, k_new, v_new, cos, sin,
                                              k_cache, v_cache, pos, rotary_dim)
        out = dual_ternary_matmul(attn_row, x2, packed_stacked, s1,
                                  scale1, bias1, scale2, bias2,
                                  clip_val, a8=True, residual=residual, mode=mode)

    Args mirror those two ops; ``x2`` is the activated mlp hidden ``(B, k2)``
    and ``residual`` the block input ``(B, N)``.  Returns ``(out (B, N),
    k_cache', v_cache')``.

    The merged Pallas kernel runs for batch-1 bf16 row-major caches on TPU
    with lane-aligned shapes; anything else composes the two existing ops
    (identical numerics, one extra dispatch).
    """
    from ternary_vllm_tpu.ops.fused_decode_attention import fused_decode_attention
    from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul

    b, h, hd = q.shape
    _, kvh, cap, _ = k_cache.shape
    planes = _num_planes(mode)
    s_tot, n = packed_stacked.shape
    s2 = s_tot - s1

    from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk

    # same chunk as the standalone attention kernel -> identical softmax
    # accumulation order (bit-exact with the composed pair)
    chunk = pick_decode_chunk(cap, kvh, hd, k_cache.dtype)
    bs = _pick_bs(s1, s2, cap // chunk) if cap % chunk == 0 else None

    def vmem(bn_c):
        return (
            2 * 2 * kvh * chunk * hd * 2  # double-buffered K+V chunk blocks
            + 2 * (bs or 0) * bn_c        # double-buffered weight block
            + planes * s_tot              # int8 activation scratch
            + 14 * bn_c                   # acc/out/scale blocks
        )

    # the FEWEST grid cells that fit VMEM: per-cell scalar bookkeeping for
    # this kernel's ~17 operand streams is the binding cost (round-5 ablation,
    # DESIGN.md §6: bn 512 -> 4096 cut the kernel 50 -> 35 us/layer at 7B
    # shapes by shrinking the grid 80 -> 10 cells)
    bn = next(
        (c for c in (n, 4096, 2048, 1024, 512, 256)
         if c <= n and n % c == 0 and vmem(c) < 13 * 1024 * 1024),
        None,
    )
    vmem_est = vmem(bn) if bn else 1 << 40
    merged_ok = (
        _on_tpu()
        and b == 1
        and k_cache.dtype == jnp.bfloat16
        # the merged kernel's skeleton (~17 operand streams x n_kt cells of
        # scalar bookkeeping) only amortizes under a heavy weight stream:
        # measured round 5, 7B out2 (21 MB/layer) +1.5% end-to-end, flagship
        # out2 (5.2 MB/layer) -2% — gate on the packed block size, and cap
        # the cell count (large capacities force bs down to cover every KV
        # chunk, e.g. 7B at cap 8448 would need 40 k-cells — the ablation
        # showed ~0.2 us/cell of bookkeeping, which would eat the win)
        and s_tot * n >= 8 * 1024 * 1024
        and bs is not None and (s_tot // bs) <= int(os.environ.get('TVT_MERGE_MAX_CELLS', '16'))
        and bs is not None
        and bn is not None
        and vmem_est < 13 * 1024 * 1024
        and s1 % 128 == 0
        and s2 % 128 == 0
        and n % 128 == 0
        and h % kvh == 0
        and s1 % hd == 0
        and bs % hd == 0
        and h * hd == planes * s1  # attn-half K must match the attention output
        and h % planes == 0  # whole head rows per plane
    )
    if merged_ok:
        sc1 = scale1.reshape(1, n).astype(jnp.float32)
        sc2 = scale2.reshape(1, n).astype(jnp.float32)
        b1 = bias1.reshape(1, n).astype(jnp.float32)
        b2 = bias2.reshape(1, n).astype(jnp.float32)
        out, kc, vc = _attn_dual_pallas(
            q, k_new, v_new, cos, sin, k_cache, v_cache, pos, x2,
            packed_stacked, sc1, b1, sc2, b2, residual.reshape(1, n),
            s1=s1, rotary_dim=rotary_dim, chunk=chunk, clip_val=clip_val,
            mode=mode, bs=bs, bn=bn, out_dtype=x2.dtype,
        )
        return out, kc, vc

    attn, kc, vc = fused_decode_attention(
        q, k_new, v_new, cos, sin, k_cache, v_cache, pos, rotary_dim=rotary_dim
    )
    attn_row = attn.reshape(b, h * hd)
    out = dual_ternary_matmul(
        attn_row, x2, packed_stacked, s1, scale1, bias1, scale2, bias2,
        clip_val=clip_val, a8=True, residual=residual, mode=mode,
    )
    return out, kc, vc
