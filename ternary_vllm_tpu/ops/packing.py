"""Bit-packing of ternary / binary weights into uint8, TPU-friendly planar-K layout.

Capability parity with the reference's packing layer (reference:
``impl/tf/moondream/ternary.py:57-176`` — ``pack_ternary2`` /
``unpack_ternary_iterative2`` pack 4 ternary params/byte with code = value+1 in a
planar layout), re-designed for TPU:

* Weights use the **contraction-first** convention ``W: (K, N)`` with ``y = x @ W``
  (the reference uses torch's ``(out, in)``; transposing at ingestion keeps the
  TPU kernel's contraction on the sublane axis and the output channel on the
  128-wide lane axis).
* **Planar along K in contiguous chunks**: K is padded to a multiple of P
  (P=4 ternary, P=8 binary), split into P contiguous *planes* of S = Kp/P rows
  each, and byte ``packed[s, n]`` stores the codes of
  ``W[j*S + s, n] for j in range(P)`` in bit-field ``j``.  Unpacking plane ``j``
  is a pure element-wise shift/mask over a ``(S, N)`` uint8 tile — no sublane
  shuffles — and yields a *contiguous* K-chunk, so the unpack-matmul kernel can
  do ``acc += x[:, jS:(j+1)S] @ plane_j`` with MXU-shaped operands.
* Ternary code = value + 1 ∈ {0, 1, 2} (2 bits); K-padding uses code 1 (value 0)
  which is exactly neutral under matmul.
* Binary code = 1 bit: ``1`` ⇔ value ``+1`` (or ``1`` for the {0,1} flavor);
  K-padding rows are only neutral if the activation is zero-padded, which the
  matmul wrappers guarantee.

All functions are pure jnp and jit-safe; they run on CPU or TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TERNARY_PLANES = 4  # 2-bit codes, 4 per byte
BINARY_PLANES = 8  # 1-bit codes, 8 per byte


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def packed_ternary_shape(k: int, n: int) -> tuple[int, int]:
    """Packed array shape for a logical (k, n) ternary weight."""
    return (_round_up(k, TERNARY_PLANES) // TERNARY_PLANES, n)


def packed_binary_shape(k: int, n: int) -> tuple[int, int]:
    return (_round_up(k, BINARY_PLANES) // BINARY_PLANES, n)


@jax.jit
def _pack_ternary_impl(w):
    k, n = w.shape
    kp = _round_up(k, TERNARY_PLANES)
    s = kp // TERNARY_PLANES
    # codes: value + 1 in {0,1,2}; pad with code 1 (= value 0, matmul-neutral)
    q = (w >= 0.5).astype(jnp.uint8) * 2 + ((w > -0.5) & (w < 0.5)).astype(jnp.uint8)
    if kp != k:
        q = jnp.concatenate([q, jnp.ones((kp - k, n), jnp.uint8)], axis=0)
    planes = q.reshape(TERNARY_PLANES, s, n)
    packed = jnp.zeros((s, n), jnp.uint8)
    for j in range(TERNARY_PLANES):
        packed = packed | (planes[j] << (2 * j))
    return packed


def pack_ternary(w) -> jnp.ndarray:
    """Pack a ternary {-1,0,+1} weight ``w: (K, N)`` into uint8 ``(ceil(K/4), N)``.

    Values outside {-1,0,+1} are hard-ternarized with thresholds ±0.5 (the
    reference's ``tri_step`` semantics, reference ``binary/modules.py:21-26``),
    so calling this on latent float weights is equivalent to quantize-then-pack.
    Jitted (one fused program per shape) — keeps host↔device dispatch off the
    offline-conversion critical path.
    """
    w = jnp.asarray(w)
    if w.ndim != 2:
        raise ValueError(f"pack_ternary expects 2D (K, N), got {w.shape}")
    return _pack_ternary_impl(w)


@functools.partial(jax.jit, static_argnames=("k", "dtype"))
def unpack_ternary(packed, k: int, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`pack_ternary`: uint8 ``(S, N)`` → ``(k, N)`` in ``dtype``."""
    packed = jnp.asarray(packed)
    s, n = packed.shape
    planes = [
        (((packed >> (2 * j)) & 0x3).astype(jnp.int8) - 1).astype(dtype)
        for j in range(TERNARY_PLANES)
    ]
    full = jnp.concatenate(planes, axis=0)
    return full[:k]


@jax.jit
def _pack_binary_impl(w):
    k, n = w.shape
    kp = _round_up(k, BINARY_PLANES)
    s = kp // BINARY_PLANES
    bits = (w >= 0).astype(jnp.uint8)
    if kp != k:
        bits = jnp.concatenate([bits, jnp.zeros((kp - k, n), jnp.uint8)], axis=0)
    planes = bits.reshape(BINARY_PLANES, s, n)
    packed = jnp.zeros((s, n), jnp.uint8)
    for j in range(BINARY_PLANES):
        packed = packed | (planes[j] << j)
    return packed


def pack_binary(w, zero_one: bool = False) -> jnp.ndarray:
    """Pack a binary weight ``w: (K, N)`` into uint8 ``(ceil(K/8), N)``.

    ``zero_one=False``: values {-1,+1}, bit = (w >= 0)  (sign semantics,
    reference ``binary/modules.py:5-10``).
    ``zero_one=True``: values {0,1}, bit = (w >= 0) — the step quantizer
    (reference ``binary/modules.py:13-18``); the flavor only changes *unpacking*.
    """
    del zero_one  # packing is identical for both flavors
    w = jnp.asarray(w)
    if w.ndim != 2:
        raise ValueError(f"pack_binary expects 2D (K, N), got {w.shape}")
    return _pack_binary_impl(w)


@functools.partial(jax.jit, static_argnames=("k", "zero_one", "dtype"))
def unpack_binary(packed, k: int, zero_one: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`pack_binary`: uint8 ``(S, N)`` → ``(k, N)`` in ``dtype``."""
    packed = jnp.asarray(packed)
    planes = []
    for j in range(BINARY_PLANES):
        bit = ((packed >> j) & 0x1).astype(jnp.int8)
        val = bit if zero_one else bit * 2 - 1
        planes.append(val.astype(dtype))
    full = jnp.concatenate(planes, axis=0)
    return full[:k]


# ---------------------------------------------------------------------------
# q4 (nibble) format: 2 int4 values per byte along K, sublane-interleaved.
#
# TPU-specific: `pltpu.bitcast(uint8 (S, N) -> int4)` yields (2S, N) with byte
# s splitting into sublanes (2s: LOW nibble, 2s+1: HIGH nibble).  Packing to
# match that layout makes the kernel's unpack a SINGLE cast — no shifts/masks
# — at the cost of 4 bits/param instead of 2.  This is the throughput-optimal
# ternary format (the decode kernel is VPU-unpack-bound in q2); q2 remains
# the memory-optimal format.  Values may span the full int4 range [-8, 7], so
# the same format serves int4-quantized layers.
# ---------------------------------------------------------------------------


@jax.jit
def _pack_q4_impl(w):
    k, n = w.shape
    kp = _round_up(k, 2)
    q = jnp.clip(jnp.round(w), -8, 7).astype(jnp.int32)
    if kp != k:
        q = jnp.concatenate([q, jnp.zeros((kp - k, n), jnp.int32)], axis=0)
    lo = q[0::2] & 0xF
    hi = q[1::2] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8)


def pack_q4(w) -> jnp.ndarray:
    """Pack int4-valued weights ``(K, N)`` (e.g. ternary {-1,0,+1}) into uint8
    ``(ceil(K/2), N)`` in the TPU nibble-bitcast layout."""
    w = jnp.asarray(w)
    if w.ndim != 2:
        raise ValueError(f"pack_q4 expects 2D (K, N), got {w.shape}")
    return _pack_q4_impl(w)


@functools.partial(jax.jit, static_argnames=("k", "dtype"))
def unpack_q4(packed, k: int, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`pack_q4`: uint8 (S, N) -> (k, N)."""
    packed = jnp.asarray(packed).astype(jnp.int32)
    s, n = packed.shape
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    lo = lo - 16 * (lo > 7)
    hi = hi - 16 * (hi > 7)
    full = jnp.stack([lo, hi], axis=1).reshape(2 * s, n)
    return full[:k].astype(dtype)


def packed_q4_shape(k: int, n: int) -> tuple[int, int]:
    return (_round_up(k, 2) // 2, n)


# ---------------------------------------------------------------------------
# int4 planar format (w4a8): 2 offset-coded int4 values per byte, planar-K.
#
# Same planar idea as the q2 format but with 2 planes of 4-bit fields: K is
# padded to even, split into 2 contiguous planes of S = Kp/2 rows, and byte
# ``packed[s, n]`` holds code(W[s, n]) in the LOW nibble and code(W[S+s, n])
# in the HIGH nibble, with code = value + 8 ∈ [1, 15] (values clipped to
# [-7, 7]; the symmetric range keeps per-channel absmax scales exact).
#
# Why not the q4 nibble-bitcast layout above: the w4a8 kernel keeps packed
# bytes FOUR-PER-LANE (bitcast u8→i32, `& 0x0F0F0F0F` / `>> 4`, bitcast→i8)
# so each plane unpacks with 2 lane-ops per FOUR bytes (8 weights) and feeds
# the int8 MXU — the same VPU-wall-breaking trick as the w2a8 kernel.  The
# code→value offset folds into the epilogue: x@W = Σₚ xₚ@codeₚ − 8·rowsum(x).
# Used for int4-quantized dense layers (e.g. the lm_head, halving its HBM
# bytes vs int8).
# ---------------------------------------------------------------------------

INT4_PLANES = 2


@jax.jit
def _pack_int4_planar_impl(q):
    k, n = q.shape
    kp = _round_up(k, INT4_PLANES)
    s = kp // INT4_PLANES
    c = (jnp.clip(jnp.round(q), -7, 7).astype(jnp.int32) + 8).astype(jnp.uint8)
    if kp != k:
        # pad with code 8 (= value 0, matmul-neutral)
        c = jnp.concatenate([c, jnp.full((kp - k, n), 8, jnp.uint8)], axis=0)
    planes = c.reshape(INT4_PLANES, s, n)
    return planes[0] | (planes[1] << 4)


def pack_int4_planar(q) -> jnp.ndarray:
    """Pack int4-valued weights ``(K, N)`` (range [-7, 7]) into uint8
    ``(ceil(K/2), N)`` in the planar-K offset-code layout (see above)."""
    q = jnp.asarray(q)
    if q.ndim != 2:
        raise ValueError(f"pack_int4_planar expects 2D (K, N), got {q.shape}")
    return _pack_int4_planar_impl(q)


@functools.partial(jax.jit, static_argnames=("k", "dtype"))
def unpack_int4_planar(packed, k: int, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`pack_int4_planar`: uint8 ``(S, N)`` → ``(k, N)``."""
    packed = jnp.asarray(packed).astype(jnp.int32)
    lo = (packed & 0xF) - 8
    hi = ((packed >> 4) & 0xF) - 8
    full = jnp.concatenate([lo, hi], axis=0)
    return full[:k].astype(dtype)


def packed_int4_planar_shape(k: int, n: int) -> tuple[int, int]:
    return (_round_up(k, INT4_PLANES) // INT4_PLANES, n)


# ---------------------------------------------------------------------------
# numpy variants for offline/host-side conversion (no device round-trip).
# ---------------------------------------------------------------------------


def pack_ternary_np(w: np.ndarray) -> np.ndarray:
    k, n = w.shape
    kp = _round_up(k, TERNARY_PLANES)
    s = kp // TERNARY_PLANES
    q = (w >= 0.5).astype(np.uint8) * 2 + ((w > -0.5) & (w < 0.5)).astype(np.uint8)
    if kp != k:
        q = np.concatenate([q, np.ones((kp - k, n), np.uint8)], axis=0)
    planes = q.reshape(TERNARY_PLANES, s, n)
    packed = np.zeros((s, n), np.uint8)
    for j in range(TERNARY_PLANES):
        packed |= planes[j] << (2 * j)
    return packed


def pack_binary_np(w: np.ndarray) -> np.ndarray:
    k, n = w.shape
    kp = _round_up(k, BINARY_PLANES)
    s = kp // BINARY_PLANES
    bits = (w >= 0).astype(np.uint8)
    if kp != k:
        bits = np.concatenate([bits, np.zeros((kp - k, n), np.uint8)], axis=0)
    planes = bits.reshape(BINARY_PLANES, s, n)
    packed = np.zeros((s, n), np.uint8)
    for j in range(BINARY_PLANES):
        packed |= planes[j] << j
    return packed
