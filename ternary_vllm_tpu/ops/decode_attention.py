"""Fused decode attention (single query token) — flash-style Pallas kernel
that streams ONLY the live prefix of the KV cache.

Why: XLA attention over a fixed-capacity cache reads all ``max_len`` slots
every token (masked afterwards) — at max_len=1024 that is ~200 MB/token on the
flagship model, ~1/3 of the decode budget, mostly wasted when the live length
is short.  This kernel gets the live length as a scalar-prefetch argument and
uses the BlockSpec index_map to *clamp* out-of-range chunks to the last needed
block — Pallas skips the DMA when consecutive grid steps map to the same
block, so HBM traffic scales with the true sequence length, not capacity.
(The same idea as paged attention's length-bounded reads, in pure Pallas.)

Chunk default 128: reads quantize to chunk granularity, so smaller chunks
waste less bandwidth at short live lengths (measured +3-5% decode t/s on the
flagship vs 256 at live length 64-192); at long lengths the DMA bytes are
identical and only ~0.3-1 us/dead-program switch overhead differs.

Online-softmax accumulation (running max / normalizer, f32) over K-chunks;
GQA-aware (query head h reads kv head h // group).  Falls back to the XLA
masked-softmax path off-TPU or for unsupported shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)


def _decode_attn_kernel(
    pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, chunk, groups, scale
):
    """One program = ALL heads x one K-chunk (vectorized over heads — no
    per-head grid dim, no dynamic sublane indexing)."""
    bi = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[bi]
    last = pos // chunk  # index of this row's final live chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        h, hd = q_ref.shape[1], q_ref.shape[2]
        kvh = k_ref.shape[1]
        q = q_ref[0].astype(jnp.float32).reshape(kvh, groups, hd)
        k = k_ref[0].astype(jnp.float32)  # (kvh, chunk, hd)
        v = v_ref[0].astype(jnp.float32)
        # (kvh, groups, chunk) batched over kv heads
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        logits = logits.reshape(h, chunk)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
        logits = jnp.where(idx <= pos, logits, NEG_INF)

        m_prev = m_ref[:]  # (h, 1)
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)  # (h, chunk)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(kvh, groups, chunk), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(h, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _decode_attention_pallas(q, k_cache, v_cache, pos, chunk: int = 128):
    b, h, hd = q.shape
    _, kvh, t, _ = k_cache.shape
    groups = h // kvh
    n_chunks = t // chunk
    scale = 1.0 / math.sqrt(hd)

    def kv_map(bi, c, pos):
        # clamp dead chunks to the last live one -> same block index as the
        # previous grid step -> Pallas skips the DMA (length-bounded reads)
        return (bi, 0, jnp.minimum(c, pos[bi] // chunk), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, hd), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_attn_kernel, chunk=chunk, groups=groups, scale=scale
    )
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(pos_vec, q, k_cache, v_cache)


def _decode_attn_kernel_i8(
    pos_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref,
    *, chunk, groups, scale
):
    """int8-cache variant — halves KV HBM traffic vs bf16.  K is never
    dequantized: the q·k dot runs on raw int8 codes (cast once) and the
    per-position scale (lane-major (KVH, 1, chunk)) multiplies the LOGITS;
    likewise V's scale multiplies the probabilities before the p·v dot —
    mathematically identical, no (chunk, hd)-sized dequant multiplies."""
    bi = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[bi]
    last = pos // chunk

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c <= last)
    def _():
        h, hd = q_ref.shape[1], q_ref.shape[2]
        kvh = kq_ref.shape[1]
        q = q_ref[0].astype(jnp.float32).reshape(kvh, groups, hd)
        k = kq_ref[0].astype(jnp.float32)  # raw codes
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (kvh, groups, chunk)
        logits = logits * ks_ref[0].astype(jnp.float32) * scale  # (kvh,1,chunk) bcast
        logits = logits.reshape(h, chunk)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
        logits = jnp.where(idx <= pos, logits, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        ps = p.reshape(kvh, groups, chunk) * vs_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            ps, vq_ref[0].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(h, hd)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(c == jnp.minimum(last, pl.num_programs(1) - 1))
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _decode_attention_pallas_i8(q, kq, ks, vq, vs, pos, chunk: int = 128):
    b, h, hd = q.shape
    _, kvh, t, _ = kq.shape
    groups = h // kvh
    n_chunks = t // chunk
    scale = 1.0 / math.sqrt(hd)

    def kv_map(bi, c, pos):
        return (bi, 0, jnp.minimum(c, pos[bi] // chunk), 0)

    def scale_map(bi, c, pos):
        # scales are lane-major (B, KVH, 1, T): chunk index on the LAST dim
        return (bi, 0, 0, jnp.minimum(c, pos[bi] // chunk))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, chunk, hd), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, chunk), scale_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, hd), lambda bi, c, pos: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_attn_kernel_i8, chunk=chunk, groups=groups, scale=scale
    )
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(pos_vec, q, kq, ks, vq, vs)


def pick_decode_chunk(t: int, kvh: int, hd: int, itemsize: int) -> int:
    """Auto chunk for the chunked decode-attention kernels: 256 at long
    context, 128 otherwise.

    Round-4 busy-time study (docs/DESIGN.md §6): at 8k live the chunk=128
    kernel is bound by the per-chunk serial compute chain (QK → softmax →
    PV, ~0.5 µs beyond the 1.41 µs/chunk DMA floor → 1.90 µs per 128
    tokens); at chunk=256 the chain amortizes under the doubled DMA window
    and the kernel streams at 97% of the floor (1.43 µs per 128 tokens).
    Round 3 had measured "256 ≈ 128" on wall-clock t/s — a noise artifact
    of the remote transport; per-op busy times settled it.

    256 only when (a) capacity is long-context (≥ 2048 — short caches pay
    extra dead-chunk bytes instead: 1005 vs 1019 t/s on the flagship
    bench, round 2), (b) capacity divides, and (c) the two double-buffered
    K/V streams fit the VMEM budget (blocks × 2 buffers × 2 arrays ≤ 6 MB;
    8 MB measured OOM at compile) — the hd=128 7B stays at 128 in bf16 but
    gets 256 with int8 codes."""
    if t >= 2048 and t % 256 == 0 and kvh * hd * 256 * itemsize * 4 <= 6 * 1024 * 1024:
        return 256
    return 128


def decode_attention_int8(q, kq, ks, vq, vs, pos, chunk: int | None = None, impl: str = "auto"):
    """Single-token attention against the int8-quantized cache
    (``phi.init_cache(..., dtype="int8")`` layout: codes (B, KVH, T, hd),
    scales lane-major (B, KVH, 1, T))."""
    t = kq.shape[2]
    if chunk is None:
        chunk = pick_decode_chunk(t, kq.shape[1], kq.shape[3], 1)
    shapes_ok = t % chunk == 0 and t >= chunk
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = shapes_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if not use_pallas:
        ks_t = ks.transpose(0, 1, 3, 2).astype(jnp.float32)  # (B, KVH, T, 1)
        vs_t = vs.transpose(0, 1, 3, 2).astype(jnp.float32)
        k = (kq.astype(jnp.float32) * ks_t).astype(q.dtype)
        v = (vq.astype(jnp.float32) * vs_t).astype(q.dtype)
        return _decode_attention_xla(q, k, v, pos)
    return _decode_attention_pallas_i8(q, kq, ks, vq, vs, jnp.asarray(pos), chunk=chunk)


def _decode_attention_xla(q, k_cache, v_cache, pos):
    b, h, hd = q.shape
    _, kvh, t, _ = k_cache.shape
    groups = h // kvh
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    if groups > 1:
        kf = jnp.repeat(kf, groups, axis=1)
        vf = jnp.repeat(vf, groups, axis=1)
    logits = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32), kf) / math.sqrt(hd)
    idx = jnp.arange(t)[None, None, :]
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(-1, 1, 1)  # scalar or (B,)
    logits = jnp.where(idx <= pos_arr, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p, vf).astype(q.dtype)


def decode_attention(q, k_cache, v_cache, pos, chunk: int | None = None, impl: str = "auto"):
    """Single-token attention against a fixed-capacity cache.

    Args:
      q: (B, H, hd) query for the new token (already rotary-embedded).
      k_cache/v_cache: (B, KVH, T, hd) float caches, slot ``pos`` already
        holding the new token's K/V.
      pos: scalar int32 — index of the newest live slot (attend to [0, pos]).

    Returns (B, H, hd)."""
    t = k_cache.shape[2]
    if chunk is None:
        chunk = pick_decode_chunk(t, k_cache.shape[1], k_cache.shape[3], k_cache.dtype.itemsize)
    shapes_ok = t % chunk == 0 and t >= chunk
    on_tpu = jax.default_backend() == "tpu"
    # auto: pallas on TPU only (interpret mode off-TPU is for explicit tests)
    use_pallas = shapes_ok and (impl == "pallas" or (impl == "auto" and on_tpu))
    if not use_pallas:
        return _decode_attention_xla(q, k_cache, v_cache, pos)
    return _decode_attention_pallas(q, k_cache, v_cache, jnp.asarray(pos), chunk=chunk)
