"""Packed ternary / binary matmul: Pallas TPU kernel + XLA fallback.

This is the TPU-native replacement for the reference's fused native op
``larq_compute_engine.ops.ternary_matmul(x, packed_w, scale, bias, clip)``
(reference ``impl/tf/moondream/ternary.py:281``, C++ sources out-of-tree) and
its pure-TF strided variant ``ScaledTernaryPackedMM``
(``impl/tf/moondream/ternary.py:485-538``).

Design (TPU-first, not a translation):

* Packed weights live in HBM as uint8 ``(S, N)`` with the planar-K layout of
  :mod:`ternary_vllm_tpu.ops.packing` (plane ``j`` = contiguous K-chunk
  ``[j*S, (j+1)*S)``).  The 4x (ternary) / 8x (binary) HBM-byte reduction vs
  bf16 is the performance story: decode is weight-streaming-bound, so fewer
  bytes = more tokens/sec.
* The kernel streams a ``(BS, BN)`` packed tile into VMEM, unpacks each 2-bit
  (1-bit) plane with shift/mask on the VPU, and feeds the MXU with
  ``acc += x[:, j*S + kt*BS : ...] @ plane_j`` — "multiply-free" is a CPU
  virtue; on TPU the right move is unpack-to-narrow-float-then-MXU.
* f32 accumulation in VMEM scratch across the K grid dimension; fused epilogue
  ``y = act(clip(acc * scale + bias, ±clip_val))`` (matching the reference's
  ScaledTernary* layer contract, ``impl/tf/moondream/ternary.py:210-250``).
* The packed buffer is a kernel *argument*, never a traced constant — XLA can
  neither constant-fold it to f32 nor differentiate through it, which is the
  TPU-native answer to the reference's ``prevent_folding`` war
  (``impl/tf/moondream/ternary.py:219-231``).

Alignment requirements for the Pallas path (otherwise we fall back to a pure
XLA unpack+matmul, which is still correct and fast under fusion):
  * N  % 128 == 0  (lane axis)
  * S  % 128 == 0  (so per-plane K offsets are lane-aligned for x slicing)
Use ``pack_ternary(w)`` on K padded to a multiple of 512 (ternary) / 1024
(binary) to satisfy S alignment; ternary K-padding (code 1 = value 0) is
matmul-neutral and x is zero-padded here for the binary case.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ternary_vllm_tpu.ops.packing import (
    BINARY_PLANES,
    TERNARY_PLANES,
    unpack_binary,
    unpack_q4,
    unpack_ternary,
)

_ACTS = {
    None: lambda x: x,
    "none": lambda x: x,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": lambda x: jnp.maximum(x, 0.0),
    "silu": jax.nn.silu,
}


def _apply_epilogue(acc, scale, bias, clip_val, act):
    out = acc * scale + bias
    if clip_val is not None:
        out = jnp.clip(out, -abs(clip_val), abs(clip_val))
    return _ACTS[act](out)


def _decode_plane(packed, j, mode):
    """Unpack bit-plane ``j`` of a packed tile to float32 codes.

    ``packed`` must already be int32: Mosaic has neither uint8→float casts nor
    int8 vector shifts, so the kernel widens the uint8 tile to int32 once and
    all bit twiddling happens on i32 lanes."""
    if packed.dtype != jnp.int32:
        packed = packed.astype(jnp.int32)
    if mode == "ternary":
        return ((packed >> (2 * j)) & 0x3).astype(jnp.float32) - 1.0
    bit = ((packed >> j) & 0x1).astype(jnp.float32)
    if mode == "binary":
        return bit * 2.0 - 1.0
    if mode == "binary01":
        return bit
    raise ValueError(f"unknown mode {mode!r}")


_MODES = ("ternary", "binary", "binary01")


def _num_planes(mode):
    if mode not in _MODES:
        raise ValueError(f"unknown quantization mode {mode!r}; expected one of {_MODES}")
    return TERNARY_PLANES if mode == "ternary" else BINARY_PLANES


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _packed_matmul_kernel(
    x_ref, p_ref, scale_ref, bias_ref, o_ref, acc_ref, *, s, bs, n_kt, mode, clip_val, act,
    act_split=None, bn=None,
):
    """Unpack cost is the whole ballgame for decode (matvec): the MXU is idle
    waiting on the VPU, so the kernel matmuls the raw bit-field CODES (3 VPU
    ops/plane: shift, mask, cast-to-input-dtype) and folds the code→value
    affine map into the epilogue:

      ternary  w = code − 1:  x@W = Σₚ xₚ@codeₚ − rowsum(x)
      binary   w = 2·bit − 1: x@W = 2·Σₚ xₚ@bitₚ − rowsum(x)
      binary01 w = bit:       x@W = Σₚ xₚ@bitₚ

    (plane 0 needs no shift; the top plane needs no mask)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    planes = _num_planes(mode)
    bits = 2 if mode == "ternary" else 1
    mask = (1 << bits) - 1
    packed = p_ref[:].astype(jnp.int32)  # widen once; Mosaic has no i8 shifts
    acc = acc_ref[:]
    for j in range(planes):
        shifted = packed >> (bits * j) if j else packed
        codes = shifted if j == planes - 1 else shifted & mask
        w = codes.astype(x_ref.dtype)
        xs = x_ref[:, pl.ds(j * s + kt * bs, bs)]
        acc = acc + jnp.dot(xs, w, preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(kt == n_kt - 1)
    def _():
        acc = acc_ref[:]
        if mode != "binary01":
            rs = jnp.sum(x_ref[:].astype(jnp.float32), axis=1, keepdims=True)
            acc = (2.0 * acc - rs) if mode == "binary" else (acc - rs)
        if act_split is None:
            out = _apply_epilogue(acc, scale_ref[:], bias_ref[:], clip_val, act)
        else:
            # act only on output columns >= act_split (fused [wqkv | fc1]:
            # gelu belongs to the fc1 half only)
            out = _apply_epilogue(acc, scale_ref[:], bias_ref[:], clip_val, None)
            col = pl.program_id(1) * bn + jax.lax.broadcasted_iota(
                jnp.int32, out.shape, 1
            )
            out = jnp.where(col >= act_split, _ACTS[act](out), out)
        o_ref[:] = out.astype(o_ref.dtype)


def _pick_block(dim: int, candidates) -> Optional[int]:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _pick_w2a8_blocks(
    bm: int, kp: int, s: int, n: int, *, n_acc: int = 1, x_itemsize: int = 2
):
    """(bm, bs, bn) for the w2a8 kernels, sized to fit scoped VMEM.

    Prefers the widest bn (fewer grid steps, full-line HBM streams for the
    packed weight) subject to a conservative VMEM budget: double-buffered
    x/weight/out blocks + int8-xq and int32-accumulator scratch (``n_acc``
    accumulators for the dual kernel) must fit well under the ~16 MB scoped
    limit — at decode bm=1 this still picks bn=n, while prefill (bm up to
    128) backs off.  ``bm`` is halved (min 16) when the x block alone busts
    the budget — large-K fused layers (e.g. the 7B dual's K1+K2=20480) OOM'd
    scoped VMEM at prefill shapes otherwise."""
    budget = 10 * 1024 * 1024
    # x double-buffered + int8 xq scratch (in-kernel quantization)
    while bm > 16 and bm * kp * (2 * x_itemsize + 1) > budget // 2:
        bm //= 2
    x_bytes = bm * kp * (2 * x_itemsize + 1)

    def pick(candidates):
        for cand_n in candidates:
            if cand_n > n or n % cand_n:
                continue
            out_bytes = bm * cand_n * (2 * 2 + 4 * n_acc)  # bf16 out x2 + i32 acc
            for cand_s in (1024, 512, 256, 128):
                if s % cand_s:
                    continue
                # 5x the packed block: 2 DMA buffers + Mosaic stack
                # temporaries for the unpack (w32 / shifted / i8 planes)
                if x_bytes + out_bytes + 5 * cand_s * cand_n <= budget:
                    return bm, cand_s, cand_n
        return None

    got = pick((n, 4096, 2048, 1024, 512, 256, 128))
    if got is not None and got[2] < 2048:
        # narrow blocks = narrow strided DMA segments over a wide row-major
        # weight array.  Round-5 13B study: n=35840 has no power-of-two
        # divisor above 1024, and (256, 1024) blocks streamed in_proj at
        # 512 GB/s vs ~745 at wider blocks — retry with the array's actual
        # divisors before accepting a degraded width.  Shapes the hardcoded
        # list already serves well (flagship 14336, 7B 28672) are unchanged.
        wide = sorted(
            (c for c in range(2048, min(n, 8192) + 1, 128) if n % c == 0),
            reverse=True,
        )
        better = pick(tuple(wide))
        if better is not None:
            got = better
    if got is not None:
        return got
    return bm, _pick_block(s, (512, 256, 128)), 128


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "clip_val", "act", "out_dtype", "bm", "bn", "bs", "interpret", "act_split"
    ),
)
def _packed_matmul_pallas(
    x, packed, scale, bias, *, mode, clip_val, act, out_dtype, bm, bn, bs,
    interpret=False, act_split=None,
):
    m, kp = x.shape
    s, n = packed.shape
    n_kt = s // bs
    grid = (pl.cdiv(m, bm), n // bn, n_kt)

    kernel = functools.partial(
        _packed_matmul_kernel,
        s=s,
        bs=bs,
        n_kt=n_kt,
        mode=mode,
        clip_val=clip_val,
        act=act,
        act_split=act_split,
        bn=bn,
    )
    planes = _num_planes(mode)
    cost = pl.CostEstimate(
        flops=2 * m * n * kp,
        bytes_accessed=s * n + m * kp * x.dtype.itemsize + m * n * jnp.dtype(out_dtype).itemsize,
        transcendentals=m * n if act in ("gelu_new", "gelu", "silu") else 0,
    )
    del planes
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(x, packed, scale, bias)


def _q4_matmul_kernel(
    x_ref, p_ref, scale_ref, bias_ref, o_ref, acc_ref, *, bs, n_kt, clip_val, act
):
    """q4 (nibble) kernel: `bitcast(uint8 -> int4)` doubles the sublane dim
    into true int4 weights, so the unpack is ONE cast — the decode-bound VPU
    work of the q2 kernel disappears (see ops/packing.py q4 notes)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = pltpu.bitcast(p_ref[:], jnp.int4).astype(x_ref.dtype)  # (2*BS, BN)
    xs = x_ref[:, pl.ds(kt * 2 * bs, 2 * bs)]
    acc_ref[:] = acc_ref[:] + jnp.dot(xs, w, preferred_element_type=jnp.float32)

    @pl.when(kt == n_kt - 1)
    def _():
        out = _apply_epilogue(acc_ref[:], scale_ref[:], bias_ref[:], clip_val, act)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("clip_val", "act", "out_dtype", "bm", "bn", "bs", "interpret"),
)
def _q4_matmul_pallas(
    x, packed, scale, bias, *, clip_val, act, out_dtype, bm, bn, bs, interpret=False
):
    m, kp = x.shape
    s, n = packed.shape
    n_kt = s // bs
    grid = (pl.cdiv(m, bm), n // bn, n_kt)
    kernel = functools.partial(
        _q4_matmul_kernel, bs=bs, n_kt=n_kt, clip_val=clip_val, act=act
    )
    cost = pl.CostEstimate(
        flops=2 * m * n * kp,
        bytes_accessed=s * n + m * kp * x.dtype.itemsize + m * n * jnp.dtype(out_dtype).itemsize,
        transcendentals=m * n if act in ("gelu_new", "gelu", "silu") else 0,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(x, packed, scale, bias)


# ---------------------------------------------------------------------------
# w2a8: int8-activation packed matmul — the VPU-unpack-wall breaker
#
# The q2 kernel above is VPU-bound: ~3 lane-ops per logical weight (widen to
# i32, then shift/mask/cast per 2-bit plane, one byte per 32-bit lane).  This
# variant keeps the packed bytes FOUR-PER-LANE the whole way:
#   bitcast u8 (BS, BN) -> i32 (BS/4, BN)      # 4 bytes/lane, free
#   plane t: (w32 >> 2t) & 0x03030303          # 2 lane-ops per FOUR bytes
#   bitcast  -> i8 (BS, BN) codes in {0,1,2}   # free
#   int8 x int8 MXU dot -> i32 accumulator     # exact
# = ~7 lane-ops per 4 bytes (16 weights) vs ~12 per byte (4 weights): ~7x less
# VPU work, measured 1.5-1.8x faster per matmul at decode shapes (the rest is
# HBM).  Price: activations are quantized to int8 with a per-row absmax scale
# (w2a8) — exact integer arithmetic inside, one quantization of x outside.
# The code->value affine map folds into the epilogue exactly as in the q2
# kernel (ternary: acc - rowsum(xq); binary: 2*acc - rowsum; binary01: acc).
# ---------------------------------------------------------------------------


def quantize_activations(x):
    """Per-row symmetric int8 quantization: ``x ~= xq * xscale``.

    x: (M, K) float -> (xq int8 (M, K), xscale f32 (M, 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xscale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    return xq, xscale


def _quantize_rows_in_kernel(x_ref, xq_ref, xs_ref, lo=None, hi=None):
    """Per-row int8 quantization inside the kernel (VMEM->VMEM), matching
    :func:`quantize_activations` bit-for-bit (same f32 elementwise ops; the
    max reduction is order-insensitive).  Quantizing at ``kt == 0`` into
    scratch removes the per-matmul XLA convert/reduce glue that otherwise
    costs ~1/4 of a decode step at batch 1 (trace: `convert` + `*_reduce`
    fusions).  ``lo:hi`` restricts to a column span (dual kernel)."""
    sl = slice(lo, hi) if lo is not None or hi is not None else slice(None)
    xf = x_ref[:, sl].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    xq_ref[:, sl] = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    xs_ref[:] = xs


def _ln_rows(xf, lns, lnb, eps):
    """LayerNorm over the last axis in f32 (same op sequence as
    ``models.phi._layer_norm``: mean, mean-of-squared-deviation, rsqrt)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * lns.astype(jnp.float32) + lnb.astype(jnp.float32)


def _ln_quantize_rows_in_kernel(x_ref, lns_ref, lnb_ref, eps, xq_ref, xs_ref):
    """Fused LayerNorm -> per-row int8 quantization prologue.

    Folding the pre-matmul LayerNorm into the kernel (the parallel Phi block
    feeds ``ln(x)`` into Wqkv/fc1, reference ``layers.py:332-348``) removes
    one XLA reduce+elementwise fusion dispatch per layer per decode step.
    The LN result round-trips through the activation dtype (bf16) so the
    quantization sees exactly what the unfused ``_layer_norm`` path emits."""
    h = _ln_rows(x_ref[:].astype(jnp.float32), lns_ref[:], lnb_ref[:], eps)
    h = h.astype(x_ref.dtype).astype(jnp.float32)
    amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    xs = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    xq_ref[:] = jnp.clip(jnp.round(h / xs), -127, 127).astype(jnp.int8)
    xs_ref[:] = xs


def _w2a8_matmul_kernel(
    *refs, s, bs, n_kt, mode, clip_val, act, act_split=None, bn=None, ln_eps=None,
):
    if ln_eps is None:
        x_ref, p_ref, scale_ref, bias_ref, o_ref, xq_ref, xs_ref, acc_ref = refs
        lns_ref = lnb_ref = None
    else:
        (x_ref, p_ref, scale_ref, bias_ref, lns_ref, lnb_ref,
         o_ref, xq_ref, xs_ref, acc_ref) = refs
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        if ln_eps is None:
            _quantize_rows_in_kernel(x_ref, xq_ref, xs_ref)
        else:
            _ln_quantize_rows_in_kernel(x_ref, lns_ref, lnb_ref, ln_eps, xq_ref, xs_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    planes = _num_planes(mode)
    bits = 2 if mode == "ternary" else 1
    lane_mask = 0x03030303 if bits == 2 else 0x01010101
    w32 = pltpu.bitcast(p_ref[:], jnp.int32)  # (bs/4, bn): 4 packed bytes/lane
    acc = acc_ref[:]
    for t in range(planes):
        sh = w32 >> (bits * t) if t else w32
        c8 = pltpu.bitcast(sh & lane_mask, jnp.int8)  # (bs, bn) codes
        xs = xq_ref[:, pl.ds(t * s + kt * bs, bs)]
        acc = acc + jax.lax.dot_general(
            xs, c8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    acc_ref[:] = acc

    @pl.when(kt == n_kt - 1)
    def _():
        acc = acc_ref[:]
        if mode != "binary01":
            rs = jnp.sum(xq_ref[:].astype(jnp.int32), axis=1, keepdims=True)
            acc = (2 * acc - rs) if mode == "binary" else (acc - rs)
        accf = acc.astype(jnp.float32) * xs_ref[:]
        if act_split is None:
            out = _apply_epilogue(accf, scale_ref[:], bias_ref[:], clip_val, act)
        else:
            out = _apply_epilogue(accf, scale_ref[:], bias_ref[:], clip_val, None)
            col = pl.program_id(1) * bn + jax.lax.broadcasted_iota(
                jnp.int32, out.shape, 1
            )
            out = jnp.where(col >= act_split, _ACTS[act](out), out)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "clip_val", "act", "out_dtype", "bm", "bn", "bs", "act_split", "ln_eps"
    ),
)
def _w2a8_matmul_pallas(
    x, packed, scale, bias, ln_scale=None, ln_bias=None, *, mode, clip_val, act,
    out_dtype, bm, bn, bs, act_split=None, ln_eps=None,
):
    m, kp = x.shape
    s, n = packed.shape
    n_kt = s // bs
    kernel = functools.partial(
        _w2a8_matmul_kernel,
        s=s, bs=bs, n_kt=n_kt, mode=mode, clip_val=clip_val, act=act,
        act_split=act_split, bn=bn, ln_eps=ln_eps,
    )
    cost = pl.CostEstimate(
        flops=2 * m * n * kp,
        bytes_accessed=s * n + m * kp + m * n * jnp.dtype(out_dtype).itemsize,
        transcendentals=m * n if act in ("gelu_new", "gelu", "silu") else 0,
    )
    in_specs = [
        pl.BlockSpec((bm, kp), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scale, bias]
    if ln_eps is not None:
        in_specs += [
            pl.BlockSpec((1, kp), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [ln_scale, ln_bias]
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, bm), n // bn, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, kp), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(*operands)


def _w2a8_matmul_xla(
    xq, xscale, packed, scale, bias, *, mode, clip_val, act, out_dtype, kp,
    act_split=None,
):
    """Bit-exact XLA fallback: same integer arithmetic as the Pallas kernel."""
    if mode == "ternary":
        w = unpack_ternary(packed, kp, dtype=jnp.int8)
    else:
        w = unpack_binary(packed, kp, zero_one=(mode == "binary01"), dtype=jnp.int8)
    acc = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    accf = acc.astype(jnp.float32) * xscale
    if act_split is None:
        out = _apply_epilogue(accf, scale, bias, clip_val, act)
    else:
        out = _apply_epilogue(accf, scale, bias, clip_val, None)
        cols = jnp.arange(out.shape[-1])[None, :]
        out = jnp.where(cols >= act_split, _ACTS[act](out), out)
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# w8a8: plain int8-weight matmul (per-output-channel scale) — used for the
# lm_head, whose bf16 vocab projection otherwise dominates the decode step's
# fixed cost (105M params = 210 MB/step streamed; int8 halves it).
# ---------------------------------------------------------------------------


def _w8a8_matmul_kernel(*refs, n_kt, ln_eps=None):
    if ln_eps is None:
        x_ref, w_ref, scale_ref, bias_ref, o_ref, xq_ref, xs_ref, acc_ref = refs
        lns_ref = lnb_ref = None
    else:
        (x_ref, w_ref, scale_ref, bias_ref, lns_ref, lnb_ref,
         o_ref, xq_ref, xs_ref, acc_ref) = refs
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        if ln_eps is None:
            _quantize_rows_in_kernel(x_ref, xq_ref, xs_ref)
        else:
            _ln_quantize_rows_in_kernel(x_ref, lns_ref, lnb_ref, ln_eps, xq_ref, xs_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk = w_ref.shape[0]
    xs = xq_ref[:, pl.ds(kt * bk, bk)]
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        xs, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(kt == n_kt - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * xs_ref[:] * scale_ref[:] + bias_ref[:]
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "ln_eps"))
def _w8a8_matmul_pallas(
    x, w_q, scale, bias, ln_scale=None, ln_bias=None,
    *, out_dtype, bm, bn, bk, ln_eps=None,
):
    m, k = x.shape
    _, n = w_q.shape
    n_kt = k // bk
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, w_q, scale, bias]
    if ln_eps is not None:
        in_specs += [
            pl.BlockSpec((1, k), lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [ln_scale, ln_bias]
    return pl.pallas_call(
        functools.partial(_w8a8_matmul_kernel, n_kt=n_kt, ln_eps=ln_eps),
        grid=(pl.cdiv(m, bm), n // bn, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)


def int8_matmul(x, w_q, scale, bias=None, impl: str = "auto", ln=None, ln_eps: float = 1e-5):
    """``y = (ln(x) @ w_q) * scale + bias`` with int8 weights and int8-quantized
    activations (w8a8).  ``w_q``: (K, N) int8; ``scale``: (N,) f32 per-output
    -channel dequantization scale (see ``quant.quantize.quantize_linear_int8``).
    ``ln``: optional ``(ln_scale, ln_bias)`` — LayerNorm fused into the kernel
    prologue (the lm_head's final LN, reference ``layers.py:363-373``).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w_q.shape[1]
    m = math.prod(lead) if lead else 1
    x2 = x.reshape(m, k)
    scale2 = scale.reshape(1, n).astype(jnp.float32)
    bias2 = (
        jnp.zeros((1, n), jnp.float32) if bias is None
        else bias.reshape(1, n).astype(jnp.float32)
    )
    aligned = (n % 128 == 0) and (k % 128 == 0)
    if impl != "xla" and aligned and _on_tpu():
        bm = min(m, 128)
        bn = _pick_block(n, (2048, 1024, 512, 256, 128))
        bk = next((c for c in (2048, 1024, 512, 256, 128) if k % c == 0 and c * bn <= 4 * 1024 * 1024), 128)
        lns = lnb = None
        if ln is not None:
            lns = ln[0].reshape(1, k).astype(jnp.float32)
            lnb = ln[1].reshape(1, k).astype(jnp.float32)
        out = _w8a8_matmul_pallas(
            x2, w_q, scale2, bias2, lns, lnb, out_dtype=x.dtype, bm=bm, bn=bn, bk=bk,
            ln_eps=ln_eps if ln is not None else None,
        )
    else:
        if ln is not None:
            x2 = _ln_rows(
                x2.astype(jnp.float32), ln[0].reshape(1, k), ln[1].reshape(1, k), ln_eps
            ).astype(x.dtype)
        xq, xscale = quantize_activations(x2)
        acc = jax.lax.dot_general(
            xq, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = (acc.astype(jnp.float32) * xscale * scale2 + bias2).astype(x.dtype)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# w4a8: planar-int4 weight matmul — halves the lm_head's HBM bytes vs w8a8.
#
# Same 4-bytes-per-lane unpack trick as w2a8, with 2 planes of 4-bit fields
# (codes = value + 8, see ops/packing.py pack_int4_planar):
#   bitcast u8 (BS, BN) -> i32 (BS/4, BN)
#   lo plane:  w32        & 0x0F0F0F0F -> bitcast i8: rows [kt*BS, +BS)
#   hi plane: (w32 >> 4)  & 0x0F0F0F0F -> bitcast i8: rows [S + kt*BS, +BS)
#   int8 MXU dots, epilogue: (acc - 8*rowsum(xq)) * xs * scale + bias
# ---------------------------------------------------------------------------


def _w4a8_matmul_kernel(*refs, s, bs, n_kt, ln_eps=None):
    if ln_eps is None:
        x_ref, p_ref, scale_ref, bias_ref, o_ref, xq_ref, xs_ref, acc_ref = refs
        lns_ref = lnb_ref = None
    else:
        (x_ref, p_ref, scale_ref, bias_ref, lns_ref, lnb_ref,
         o_ref, xq_ref, xs_ref, acc_ref) = refs
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        if ln_eps is None:
            _quantize_rows_in_kernel(x_ref, xq_ref, xs_ref)
        else:
            _ln_quantize_rows_in_kernel(x_ref, lns_ref, lnb_ref, ln_eps, xq_ref, xs_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Two 4-bit planes per packed byte.  A four-2-bit-plane reformulation
    # (lo2 + 4*hi2 per nibble, dual accumulators — the w2a8 structure) was
    # measured bit-exact and NO faster at decode (180 vs 185 µs on the head
    # shape) while doubling MXU passes at prefill, so this simpler form
    # stays (see docs/DESIGN.md §6, int4-head study).
    w32 = pltpu.bitcast(p_ref[:], jnp.int32)  # (bs/4, bn): 4 packed bytes/lane
    acc = acc_ref[:]
    for t in range(2):
        sh = w32 >> 4 if t else w32
        c8 = pltpu.bitcast(sh & 0x0F0F0F0F, jnp.int8)  # codes in [1, 15]
        xs = xq_ref[:, pl.ds(t * s + kt * bs, bs)]
        acc = acc + jax.lax.dot_general(
            xs, c8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    acc_ref[:] = acc

    @pl.when(kt == n_kt - 1)
    def _():
        rs = jnp.sum(xq_ref[:].astype(jnp.int32), axis=1, keepdims=True)
        accf = (acc_ref[:] - 8 * rs).astype(jnp.float32)
        out = accf * xs_ref[:] * scale_ref[:] + bias_ref[:]
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bs", "ln_eps")
)
def _w4a8_matmul_pallas(
    x, packed, scale, bias, ln_scale=None, ln_bias=None,
    *, out_dtype, bm, bn, bs, ln_eps=None,
):
    m, kp = x.shape
    s, n = packed.shape
    n_kt = s // bs
    in_specs = [
        pl.BlockSpec((bm, kp), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scale, bias]
    if ln_eps is not None:
        in_specs += [
            pl.BlockSpec((1, kp), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [ln_scale, ln_bias]
    cost = pl.CostEstimate(
        flops=2 * m * n * kp,
        bytes_accessed=s * n + m * kp + m * n * jnp.dtype(out_dtype).itemsize,
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_w4a8_matmul_kernel, s=s, bs=bs, n_kt=n_kt, ln_eps=ln_eps),
        grid=(pl.cdiv(m, bm), n // bn, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, kp), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(*operands)


def int4_matmul(x, packed, scale, bias=None, impl: str = "auto", ln=None, ln_eps: float = 1e-5):
    """``y = (ln(x) @ unpack_int4_planar(packed)) * scale + bias`` (w4a8).

    ``packed``: uint8 ``(K/2, N)`` from ``ops.packing.pack_int4_planar``;
    ``scale``: (N,) f32 per-output-channel dequantization scale (see
    ``quant.quantize.quantize_linear_int4``).  Activations are int8-quantized
    per row (in-kernel on the Pallas path).  ``ln``: optional fused LayerNorm
    prologue, as in :func:`int8_matmul`."""
    from ternary_vllm_tpu.ops.packing import unpack_int4_planar

    lead = x.shape[:-1]
    k = x.shape[-1]
    s, n = packed.shape
    kp = 2 * s
    if k != kp:
        raise ValueError(f"int4_matmul needs x K dim == 2*packed rows (got {k} vs {kp})")
    m = math.prod(lead) if lead else 1
    x2 = x.reshape(m, k)
    scale2 = scale.reshape(1, n).astype(jnp.float32)
    bias2 = (
        jnp.zeros((1, n), jnp.float32) if bias is None
        else bias.reshape(1, n).astype(jnp.float32)
    )
    aligned = (n % 128 == 0) and (s % 128 == 0)
    if impl != "xla" and aligned and _on_tpu():
        bm, bs_, bn_ = _pick_w2a8_blocks(
            min(m, 128), kp, s, n, x_itemsize=x2.dtype.itemsize
        )
        lns = lnb = None
        if ln is not None:
            lns = ln[0].reshape(1, k).astype(jnp.float32)
            lnb = ln[1].reshape(1, k).astype(jnp.float32)
        out = _w4a8_matmul_pallas(
            x2, packed, scale2, bias2, lns, lnb, out_dtype=x.dtype,
            bm=bm, bn=bn_, bs=bs_, ln_eps=ln_eps if ln is not None else None,
        )
    else:
        if ln is not None:
            x2 = _ln_rows(
                x2.astype(jnp.float32), ln[0].reshape(1, k), ln[1].reshape(1, k), ln_eps
            ).astype(x.dtype)
        xq, xscale = quantize_activations(x2)
        w = unpack_int4_planar(packed, kp, dtype=jnp.int8)
        acc = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = (acc.astype(jnp.float32) * xscale * scale2 + bias2).astype(x.dtype)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# XLA fallback (correct everywhere; used on CPU and for unaligned shapes)
# ---------------------------------------------------------------------------


def _packed_matmul_xla(x, packed, scale, bias, *, mode, clip_val, act, out_dtype, fmt="q2"):
    m, kp = x.shape
    s, n = packed.shape
    if fmt == "q4":
        w = unpack_q4(packed, kp, dtype=x.dtype)
    elif mode == "ternary":
        w = unpack_ternary(packed, kp, dtype=x.dtype)
    else:
        w = unpack_binary(packed, kp, zero_one=(mode == "binary01"), dtype=x.dtype)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    out = _apply_epilogue(acc, scale, bias, clip_val, act)
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Dual-source packed matmul: two stacked weights, one kernel
#
# Decode is launch-overhead-sensitive (96 small kernels/step on the flagship);
# out_proj and fc2 both produce hidden_size outputs that the parallel block
# SUMS (x + attn + mlp, reference layers.py:347), so they fuse into one kernel
# over concatenated inputs [attn_out | mlp_hidden] with the two weights packed
# separately and stacked along S (block-planar layout).  Per-source f32
# accumulators keep the reference's exact per-matrix epilogue semantics:
#   y = clip(acc1*s1 + b1, ±c) + clip(acc2*s2 + b2, ±c)
# ---------------------------------------------------------------------------


def _dual_matmul_kernel(
    x_ref, p_ref, s1_ref, b1_ref, s2_ref, b2_ref, o_ref, acc1_ref, acc2_ref,
    *, s1, s2, bs, n_kt, clip_val
):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    packed = p_ref[:].astype(jnp.int32)
    k1 = 4 * s1
    s0 = kt * bs
    in_a = s0 < s1

    @pl.when(in_a)
    def _():
        acc = acc1_ref[:]
        for j in range(4):
            sh = packed >> (2 * j) if j else packed
            codes = sh if j == 3 else sh & 3
            w = codes.astype(x_ref.dtype)
            xs = x_ref[:, pl.ds(j * s1 + s0, bs)]
            acc = acc + jnp.dot(xs, w, preferred_element_type=jnp.float32)
        acc1_ref[:] = acc

    @pl.when(jnp.logical_not(in_a))
    def _():
        acc = acc2_ref[:]
        for j in range(4):
            sh = packed >> (2 * j) if j else packed
            codes = sh if j == 3 else sh & 3
            w = codes.astype(x_ref.dtype)
            xs = x_ref[:, pl.ds(k1 + j * s2 + (s0 - s1), bs)]
            acc = acc + jnp.dot(xs, w, preferred_element_type=jnp.float32)
        acc2_ref[:] = acc

    @pl.when(kt == n_kt - 1)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        rs1 = jnp.sum(xf[:, :k1], axis=1, keepdims=True)
        rs2 = jnp.sum(xf[:, k1:], axis=1, keepdims=True)
        y1 = (acc1_ref[:] - rs1) * s1_ref[:] + b1_ref[:]
        y2 = (acc2_ref[:] - rs2) * s2_ref[:] + b2_ref[:]
        if clip_val is not None:
            y1 = jnp.clip(y1, -abs(clip_val), abs(clip_val))
            y2 = jnp.clip(y2, -abs(clip_val), abs(clip_val))
        o_ref[:] = (y1 + y2).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("s1", "clip_val", "out_dtype", "bm", "bn", "bs", "interpret"),
)
def _dual_matmul_pallas(
    x, packed, scale1, bias1, scale2, bias2, *, s1, clip_val, out_dtype, bm, bn, bs,
    interpret=False,
):
    m, ktot = x.shape
    s_tot, n = packed.shape
    s2 = s_tot - s1
    n_kt = s_tot // bs
    kernel = functools.partial(
        _dual_matmul_kernel, s1=s1, s2=s2, bs=bs, n_kt=n_kt, clip_val=clip_val
    )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, bm), n // bn, n_kt),
        in_specs=[
            pl.BlockSpec((bm, ktot), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, packed, scale1, bias1, scale2, bias2)


def _dual_w2a8_kernel(
    *refs, s1, s2, bs, n_kt, clip_val, residual=False, mode="ternary",
):
    """w2a8 variant of the dual kernel: bitcast 4-codes-per-lane unpack +
    int8 MXU dots with int32 accumulators (see the w2a8 section above); the
    two sources are int8-quantized in-kernel with separate per-row scales
    and keep separate exact epilogues.  With ``residual``, a third operand is
    added to the output in the epilogue (the parallel block's ``+ x``,
    reference ``layers.py:347``) — saving one XLA add dispatch per layer.
    ``mode`` selects the bit-plane geometry and code→value epilogue exactly
    as in the single kernel (ternary: 4×2-bit planes, acc − rowsum; binary:
    8×1-bit, 2·acc − rowsum; binary01: 8×1-bit, acc)."""
    if residual:
        (x_ref, p_ref, s1_ref, b1_ref, s2_ref, b2_ref, r_ref, o_ref,
         xq_ref, xs1_ref, xs2_ref, acc1_ref, acc2_ref) = refs
    else:
        (x_ref, p_ref, s1_ref, b1_ref, s2_ref, b2_ref, o_ref,
         xq_ref, xs1_ref, xs2_ref, acc1_ref, acc2_ref) = refs
        r_ref = None
    kt = pl.program_id(2)
    planes = _num_planes(mode)
    bits = 2 if mode == "ternary" else 1
    lane_mask = 0x03030303 if bits == 2 else 0x01010101
    k1_cols = planes * s1

    @pl.when(kt == 0)
    def _():
        _quantize_rows_in_kernel(x_ref, xq_ref, xs1_ref, lo=0, hi=k1_cols)
        _quantize_rows_in_kernel(x_ref, xq_ref, xs2_ref, lo=k1_cols, hi=None)
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    w32 = pltpu.bitcast(p_ref[:], jnp.int32)  # (bs/4, bn): 4 packed bytes/lane
    k1 = planes * s1
    s0 = kt * bs
    in_a = s0 < s1

    @pl.when(in_a)
    def _():
        acc = acc1_ref[:]
        for t in range(planes):
            sh = w32 >> (bits * t) if t else w32
            c8 = pltpu.bitcast(sh & lane_mask, jnp.int8)
            xs = xq_ref[:, pl.ds(t * s1 + s0, bs)]
            acc = acc + jax.lax.dot_general(
                xs, c8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        acc1_ref[:] = acc

    @pl.when(jnp.logical_not(in_a))
    def _():
        acc = acc2_ref[:]
        for t in range(planes):
            sh = w32 >> (bits * t) if t else w32
            c8 = pltpu.bitcast(sh & lane_mask, jnp.int8)
            xs = xq_ref[:, pl.ds(k1 + t * s2 + (s0 - s1), bs)]
            acc = acc + jax.lax.dot_general(
                xs, c8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        acc2_ref[:] = acc

    @pl.when(kt == n_kt - 1)
    def _():
        acc1 = acc1_ref[:]
        acc2 = acc2_ref[:]
        if mode != "binary01":
            xi = xq_ref[:].astype(jnp.int32)
            rs1 = jnp.sum(xi[:, :k1], axis=1, keepdims=True)
            rs2 = jnp.sum(xi[:, k1:], axis=1, keepdims=True)
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
        if r_ref is not None:
            out = out + r_ref[:].astype(o_ref.dtype)
        o_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("s1", "clip_val", "out_dtype", "bm", "bn", "bs", "mode"),
)
def _dual_w2a8_pallas(
    x, packed, scale1, bias1, scale2, bias2, res=None,
    *, s1, clip_val, out_dtype, bm, bn, bs, mode="ternary",
):
    m, ktot = x.shape
    s_tot, n = packed.shape
    s2 = s_tot - s1
    n_kt = s_tot // bs
    kernel = functools.partial(
        _dual_w2a8_kernel, s1=s1, s2=s2, bs=bs, n_kt=n_kt, clip_val=clip_val,
        residual=res is not None, mode=mode,
    )
    in_specs = [
        pl.BlockSpec((bm, ktot), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scale1, bias1, scale2, bias2]
    if res is not None:
        in_specs.append(
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM)
        )
        operands.append(res)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, bm), n // bn, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, ktot), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.VMEM((bm, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)


def _dual_w2a8_xla(xq, xs1, xs2, packed, sc1, b1, sc2, b2, *, s1, k1, k2, clip_val, out_dtype, mode="ternary"):
    """Bit-exact XLA fallback for the dual w2a8 kernel."""
    if mode == "ternary":
        w1 = unpack_ternary(packed[:s1], k1, dtype=jnp.int8)
        w2 = unpack_ternary(packed[s1:], k2, dtype=jnp.int8)
    else:
        zo = mode == "binary01"
        w1 = unpack_binary(packed[:s1], k1, zero_one=zo, dtype=jnp.int8)
        w2 = unpack_binary(packed[s1:], k2, zero_one=zo, dtype=jnp.int8)
    a1 = jax.lax.dot_general(
        xq[:, :k1], w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    a2 = jax.lax.dot_general(
        xq[:, k1:], w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y1 = a1.astype(jnp.float32) * xs1 * sc1 + b1
    y2 = a2.astype(jnp.float32) * xs2 * sc2 + b2
    if clip_val is not None:
        y1 = jnp.clip(y1, -abs(clip_val), abs(clip_val))
        y2 = jnp.clip(y2, -abs(clip_val), abs(clip_val))
    return (y1 + y2).astype(out_dtype)


def dual_ternary_matmul(
    x1,
    x2,
    packed_stacked,
    s1: int,
    scale1,
    bias1,
    scale2,
    bias2,
    clip_val: Optional[float] = 100.0,
    impl: str = "auto",
    a8: bool = False,
    residual=None,
    mode: str = "ternary",
):
    """``clip(x1 @ W1 * s1 + b1) + clip(x2 @ W2 * s2 + b2) [+ residual]``.

    ``packed_stacked``: ``vstack(pack(W1), pack(W2))`` — each weight packed
    separately (block-planar, same rule as sharded packing) with the
    ``mode``'s packer (``pack_ternary`` / ``pack_binary``).
    ``s1``: packed-row count of the first block (= K1/4 ternary, K1/8 binary).
    ``a8``: quantize each source to int8 (separate per-row scales) and use
    the int8-MXU dual kernel.  Binary modes require ``a8`` on the kernel
    path (the bf16-activation dual kernel is ternary-only).
    ``residual``: optional ``(..., N)`` tensor added to the output — fused
    into the kernel epilogue on the a8 Pallas path (the parallel block's
    skip connection), plain add elsewhere.
    """
    if mode not in _MODES:
        raise ValueError(f"unknown mode {mode!r}")
    planes = _num_planes(mode)
    lead = x1.shape[:-1]
    k1, k2 = x1.shape[-1], x2.shape[-1]
    m = math.prod(lead) if lead else 1
    s_tot, n = packed_stacked.shape
    s2 = s_tot - s1
    if planes * s1 != k1 or planes * s2 != k2:
        raise ValueError(f"packed rows ({s1},{s2}) inconsistent with K dims ({k1},{k2})")
    if mode != "ternary" and not a8:
        raise NotImplementedError("binary dual fusion is wired for the a8 kernel only")

    dt = x1.dtype
    sc1 = scale1.reshape(1, n).astype(jnp.float32)
    sc2 = scale2.reshape(1, n).astype(jnp.float32)
    b1 = bias1.reshape(1, n).astype(jnp.float32)
    b2 = bias2.reshape(1, n).astype(jnp.float32)

    bs = _pick_block(math.gcd(s1, s2), (512, 256, 128))
    aligned = bs is not None and n % 128 == 0 and s1 % 128 == 0 and s2 % 128 == 0

    res2 = None if residual is None else residual.reshape(m, n)
    if a8:
        if impl != "xla" and aligned and _on_tpu():
            x = jnp.concatenate([x1.reshape(m, k1), x2.reshape(m, k2)], axis=1)
            # bs must divide BOTH packed blocks -> pick from the gcd; two
            # int32 accumulators live in scratch (n_acc=2)
            bm, bs, bn = _pick_w2a8_blocks(
                min(m, 128), k1 + k2, math.gcd(s1, s2), n, n_acc=2,
                x_itemsize=x.dtype.itemsize,
            )
            out = _dual_w2a8_pallas(
                x, packed_stacked, sc1, b1, sc2, b2, res2,
                s1=s1, clip_val=clip_val, out_dtype=dt, bm=bm, bn=bn, bs=bs,
                mode=mode,
            )
        else:
            xq1, xs1 = quantize_activations(x1.reshape(m, k1))
            xq2, xs2 = quantize_activations(x2.reshape(m, k2))
            xq = jnp.concatenate([xq1, xq2], axis=1)
            out = _dual_w2a8_xla(
                xq, xs1, xs2, packed_stacked, sc1, b1, sc2, b2,
                s1=s1, k1=k1, k2=k2, clip_val=clip_val, out_dtype=dt, mode=mode,
            )
            if res2 is not None:
                out = out + res2.astype(dt)
        return out.reshape(*lead, n)

    x = jnp.concatenate([x1.reshape(m, k1), x2.reshape(m, k2)], axis=1)
    if impl != "xla" and aligned and (_on_tpu() or impl == "pallas"):
        sub = 16 if dt == jnp.bfloat16 else 8
        bm = 128 if m >= 128 else ((m + sub - 1) // sub) * sub
        bn = _pick_block(n, (512, 256, 128))
        out = _dual_matmul_pallas(
            x, packed_stacked, sc1, b1, sc2, b2,
            s1=s1, clip_val=clip_val, out_dtype=dt, bm=bm, bn=bn, bs=bs,
            interpret=not _on_tpu(),
        )
    else:
        w1 = unpack_ternary(packed_stacked[:s1], k1, dtype=dt)
        w2 = unpack_ternary(packed_stacked[s1:], k2, dtype=dt)
        y1 = jnp.dot(x[:, :k1], w1, preferred_element_type=jnp.float32) * sc1 + b1
        y2 = jnp.dot(x[:, k1:], w2, preferred_element_type=jnp.float32) * sc2 + b2
        if clip_val is not None:
            y1 = jnp.clip(y1, -abs(clip_val), abs(clip_val))
            y2 = jnp.clip(y2, -abs(clip_val), abs(clip_val))
        out = (y1 + y2).astype(dt)
    if res2 is not None:
        out = out + res2.astype(dt)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def quantized_matmul(
    x,
    packed,
    *,
    mode: str,
    scale=None,
    bias=None,
    clip_val: Optional[float] = 100.0,
    act: Optional[str] = None,
    impl: str = "auto",
    fmt: str = "q2",
    act_split: Optional[int] = None,
    a8: bool = False,
    ln=None,
    ln_eps: float = 1e-5,
):
    """``y = act(clip((ln(x) @ unpack(packed)) * scale + bias, ±clip_val))``.

    Args:
      x: activations ``(..., K)``, float (bf16/f32).
      packed: uint8 ``(S, N)`` planar-packed weight (see ``ops.packing``).
      mode: ``"ternary" | "binary" | "binary01"``.
      scale: per-output-channel scale ``(N,)`` (default 1).
      bias: per-output-channel bias ``(N,)`` (default 0).
      clip_val: symmetric output clip (reference default ``max_val=100.0``,
        ``binary/modules.py:58``); ``None`` disables.
      act: fused activation (``"gelu_new"`` for fc1, else ``None``).
      impl: ``"auto" | "pallas" | "xla"``.
      fmt: ``"q2"`` (bit-planes: 2-bit ternary / 1-bit binary — memory
        optimal) or ``"q4"`` (nibble int4 — throughput optimal, ternary only).
      a8: quantize activations to int8 (per-row absmax) and use the
        int8-MXU kernel — ~1.5-1.8x faster at decode shapes (see the w2a8
        section above); adds one int8 quantization of x (~2^-8 relative).
      ln: optional ``(ln_scale (K,), ln_bias (K,))`` — apply LayerNorm to x
        before the matmul, fused into the a8 kernel prologue (saves one XLA
        dispatch per call at decode); applied in XLA on fallback paths.
      ln_eps: LayerNorm epsilon (only with ``ln``).

    Returns ``(..., N)`` in ``x.dtype``.
    """
    if fmt not in ("q2", "q4"):
        raise ValueError(f"unknown packed format {fmt!r}")
    if fmt == "q4" and mode != "ternary":
        raise ValueError("q4 format only stores ternary/int4 values")
    if act_split is not None and fmt == "q4":
        raise ValueError("act_split (fused in_proj) is only wired for the q2 kernel")
    if a8 and fmt == "q4":
        raise ValueError("a8 (int8-activation) path is only wired for the q2 format")
    planes = 2 if fmt == "q4" else _num_planes(mode)
    s, n = packed.shape
    kp = s * planes
    k = x.shape[-1]
    if k > kp:
        raise ValueError(f"x K dim {k} exceeds packed capacity {kp}")
    if ln is not None and k != kp:
        raise ValueError(
            f"ln fusion requires x K dim == packed capacity (got {k} vs {kp}): "
            "LayerNorm over a zero-padded row is not the LayerNorm of the row"
        )
    lead = x.shape[:-1]
    m = math.prod(lead) if lead else 1
    x2 = x.reshape(m, k)
    if k < kp:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - k)))

    dt = x.dtype
    scale2 = jnp.ones((1, n), jnp.float32) if scale is None else scale.reshape(1, n).astype(jnp.float32)
    bias2 = jnp.zeros((1, n), jnp.float32) if bias is None else bias.reshape(1, n).astype(jnp.float32)

    if a8:
        aligned = (n % 128 == 0) and (s % 128 == 0)
        if impl != "xla" and aligned and _on_tpu():
            bm, bs_, bn_ = _pick_w2a8_blocks(
                min(m, 128), kp, s, n, x_itemsize=x2.dtype.itemsize
            )
            lns = lnb = None
            if ln is not None:
                lns = ln[0].reshape(1, kp).astype(jnp.float32)
                lnb = ln[1].reshape(1, kp).astype(jnp.float32)
            out = _w2a8_matmul_pallas(
                x2, packed, scale2, bias2, lns, lnb,
                mode=mode, clip_val=clip_val, act=act, out_dtype=dt,
                bm=bm, bn=bn_, bs=bs_, act_split=act_split,
                ln_eps=ln_eps if ln is not None else None,
            )
        else:
            if ln is not None:
                x2 = _ln_rows(
                    x2.astype(jnp.float32),
                    ln[0].reshape(1, kp),
                    ln[1].reshape(1, kp),
                    ln_eps,
                ).astype(dt)
            xq, xscale = quantize_activations(x2)
            out = _w2a8_matmul_xla(
                xq, xscale, packed, scale2, bias2,
                mode=mode, clip_val=clip_val, act=act, out_dtype=dt, kp=kp,
                act_split=act_split,
            )
        return out.reshape(*lead, n)

    if ln is not None:
        x2 = _ln_rows(
            x2.astype(jnp.float32), ln[0].reshape(1, kp), ln[1].reshape(1, kp), ln_eps
        ).astype(dt)

    use_pallas = False
    if impl in ("auto", "pallas"):
        s_align = 64 if fmt == "q4" else 128
        aligned = (n % 128 == 0) and (s % s_align == 0)
        use_pallas = aligned and (_on_tpu() or impl == "pallas")
        if impl == "pallas" and not aligned:
            raise ValueError(
                f"pallas packed matmul needs N%128==0 and S%{s_align}==0, got N={n}, S={s}"
            )
    if fmt == "q4" and use_pallas and not _on_tpu():
        use_pallas = False  # no sub-byte bitcast in interpret mode

    if use_pallas:
        sub = 16 if dt == jnp.bfloat16 else 8
        bm = 128 if m >= 128 else ((m + sub - 1) // sub) * sub
        # large tiles amortize per-tile DMA latency (decode is tile-latency
        # sensitive); cap tile bytes so double-buffered VMEM stays modest
        if fmt == "q4":
            bs = _pick_block(s, (1024, 512, 256, 128, 64))
            bn = _pick_block(n, (2048, 1024, 512, 256, 128))
            out = _q4_matmul_pallas(
                x2, packed, scale2, bias2,
                clip_val=clip_val, act=act, out_dtype=dt,
                bm=bm, bn=bn, bs=bs,
            )
        else:
            # Tile choice: PREFER full-width tiles (bn == n) — a (bs, n) tile
            # of the row-major packed array is one CONTIGUOUS DMA, which
            # streams at full HBM rate; narrower tiles are strided reads.
            # VMEM budget: 2x packed tile (double buffer) + f32 acc + bf16
            # out + resident x block must stay well under 16 MB.
            cap_packed = 2 * 1024 * 1024
            cap_accout = 4 * 1024 * 1024
            bs, bn = None, None
            for cand_n in (n, 4096, 2048, 1024, 512, 256, 128):
                if cand_n > n or n % cand_n or bm * cand_n * 6 > cap_accout:
                    continue
                cand_s = next(
                    (c for c in (1024, 512, 256, 128)
                     if s % c == 0 and c * cand_n <= cap_packed),
                    None,
                )
                if cand_s is not None:
                    bs, bn = cand_s, cand_n
                    break
            if bs is None:
                bs, bn = _pick_block(s, (512, 256, 128)), 128
            out = _packed_matmul_pallas(
                x2, packed, scale2, bias2,
                mode=mode, clip_val=clip_val, act=act, out_dtype=dt,
                bm=bm, bn=bn, bs=bs,
                interpret=not _on_tpu(),
                act_split=act_split,
            )
    else:
        out = _packed_matmul_xla(
            x2, packed, scale2, bias2, mode=mode, clip_val=clip_val,
            act=None if act_split is not None else act,
            out_dtype=dt, fmt=fmt,
        )
        if act_split is not None and act is not None:
            cols = jnp.arange(n)[None, :]
            out = jnp.where(cols >= act_split, _ACTS[act](out.astype(jnp.float32)), out.astype(jnp.float32)).astype(dt)
    return out.reshape(*lead, n)


def ternary_matmul(
    x, packed, scale=None, bias=None, clip_val=100.0, act=None, impl="auto", fmt="q2"
):
    """Fused packed-ternary matmul (the reference's ``ops.ternary_matmul``)."""
    return quantized_matmul(
        x, packed, mode="ternary", scale=scale, bias=bias, clip_val=clip_val,
        act=act, impl=impl, fmt=fmt,
    )


def binary_matmul(
    x, packed, scale=None, bias=None, clip_val=100.0, act=None, zero_one=False, impl="auto"
):
    """Fused packed-binary matmul ({-1,+1} or {0,1} weights)."""
    return quantized_matmul(
        x,
        packed,
        mode="binary01" if zero_one else "binary",
        scale=scale,
        bias=bias,
        clip_val=clip_val,
        act=act,
        impl=impl,
    )
