"""Fused rope+cache-write+attention decode kernel vs the unfused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.ops.decode_attention import _decode_attention_xla
from ternary_vllm_tpu.ops.fused_decode_attention import (
    _fused_pallas,
    _fused_xla,
    fused_decode_attention,
)

B, H, KVH, HD, RD, T = 2, 8, 4, 64, 32, 256


def _setup(seed=0, pos=(5, 130)):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(ks[0], (B, H, HD), jnp.float32)
    k_new = jax.random.normal(ks[1], (B, KVH, HD), jnp.float32)
    v_new = jax.random.normal(ks[2], (B, KVH, HD), jnp.float32)
    kc = jax.random.normal(ks[3], (B, KVH, T, HD), jnp.float32)
    vc = jax.random.normal(ks[4], (B, KVH, T, HD), jnp.float32)
    pos_v = jnp.asarray(pos, jnp.int32)
    angles = jax.random.uniform(ks[5], (B, RD // 2), maxval=3.0)
    ang = jnp.concatenate([angles, angles], axis=1)
    return q, k_new, v_new, jnp.cos(ang), jnp.sin(ang), kc, vc, pos_v


def _reference(q, k_new, v_new, cos, sin, kc, vc, pos):
    """Independent reference: rope (phi convention) + scatter + masked softmax."""

    def rope(x, c, s):
        xr, xp = x[..., :RD], x[..., RD:]
        half = RD // 2
        rot = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
        return jnp.concatenate([xr * c[:, None] + rot * s[:, None], xp], axis=-1)

    qr = rope(q, cos, sin)
    kr = rope(k_new, cos, sin)
    kc2 = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(c, u[:, None], (0, p, 0)))(
        kc, kr, pos
    )
    vc2 = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(c, u[:, None], (0, p, 0)))(
        vc, v_new, pos
    )
    attn = _decode_attention_xla(qr, kc2, vc2, pos)
    return attn, kc2, vc2


@pytest.mark.parametrize("pos", [(5, 130), (0, 255), (127, 128)])
def test_fused_xla_matches_reference(pos):
    args = _setup(pos=pos)
    ref = _reference(*args)
    got = _fused_xla(*args, rotary_dim=RD)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pos", [(5, 130), (0, 255), (127, 128)])
def test_fused_pallas_interpret_matches_reference(pos):
    args = _setup(pos=pos)
    ref = _reference(*args)
    q, k_new, v_new, cos, sin, kc, vc, pos_v = args
    got = _fused_pallas(
        q, k_new, v_new, cos, sin, kc, vc, pos_v,
        rotary_dim=RD, chunk=128, interpret=True,
    )
    names = ("attn", "k_cache", "v_cache")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_dispatcher_falls_back_off_tpu():
    args = _setup()
    out = fused_decode_attention(*args, rotary_dim=RD)
    ref = _reference(*args)
    for r, g in zip(ref, out):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_scalar_pos_broadcasts():
    q, k_new, v_new, cos, sin, kc, vc, _ = _setup(pos=(9, 9))
    ref = _reference(q, k_new, v_new, cos, sin, kc, vc, jnp.asarray([9, 9], jnp.int32))
    got = fused_decode_attention(
        q, k_new, v_new, cos, sin, kc, vc, jnp.int32(9), rotary_dim=RD
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# int8-cache variant
# ---------------------------------------------------------------------------

from ternary_vllm_tpu.models.phi import _dequantize_kv, _quantize_kv
from ternary_vllm_tpu.ops.decode_attention import decode_attention_int8
from ternary_vllm_tpu.ops.fused_decode_attention import (
    _fused_pallas_i8,
    _fused_xla_i8,
    fused_decode_attention_int8,
)


def _setup_i8(seed=0, pos=(5, 130)):
    q, k_new, v_new, cos, sin, kc, vc, pos_v = _setup(seed, pos)
    kq, ks = _quantize_kv(kc)
    vq, vs = _quantize_kv(vc)
    return q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos_v


def _reference_i8(q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos):
    """Independent reference: rope + per-row int8 quantization (scale stored
    bf16, codes from the f32 scale) + scatter into codes/scale caches +
    attention on raw codes with the scales applied to logits/probs (identical
    math to dequantize-then-attend)."""

    def rope(x, c, s):
        xr, xp = x[..., :RD], x[..., RD:]
        half = RD // 2
        rot = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
        return jnp.concatenate([xr * c[:, None] + rot * s[:, None], xp], axis=-1)

    qr = rope(q, cos, sin)
    kr = rope(k_new, cos, sin)
    kq_new, ks_new = _quantize_kv(kr[:, :, None, :])
    vq_new, vs_new = _quantize_kv(v_new[:, :, None, :])

    def wcode(c, u, p):
        return jax.vmap(
            lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, pp, 0))
        )(c, u.astype(c.dtype), p)

    def wscale(c, u, p):
        return jax.vmap(
            lambda cc, uu, pp: jax.lax.dynamic_update_slice(cc, uu, (0, 0, pp))
        )(c, u.astype(c.dtype), p)

    kq2, ks2 = wcode(kq, kq_new, pos), wscale(ks, ks_new, pos)
    vq2, vs2 = wcode(vq, vq_new, pos), wscale(vs, vs_new, pos)
    k_full = _dequantize_kv(kq2, ks2, jnp.float32)
    v_full = _dequantize_kv(vq2, vs2, jnp.float32)
    attn = _decode_attention_xla(qr, k_full, v_full, pos)
    return attn, kq2, ks2, vq2, vs2


@pytest.mark.parametrize("pos", [(5, 130), (0, 255), (127, 128)])
def test_fused_i8_xla_matches_reference(pos):
    args = _setup_i8(pos=pos)
    ref = _reference_i8(*args)
    got = _fused_xla_i8(*args, rotary_dim=RD)
    names = ("attn", "kq", "ks", "vq", "vs")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5, err_msg=name,
        )


@pytest.mark.parametrize("pos", [(5, 130), (0, 255), (127, 128), (31, 224)])
def test_fused_i8_pallas_interpret_matches_reference(pos):
    args = _setup_i8(pos=pos)
    ref = _reference_i8(*args)
    q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos_v = args
    got = _fused_pallas_i8(
        q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos_v,
        rotary_dim=RD, chunk=128, interpret=True,
    )
    names = ("attn", "kq", "ks", "vq", "vs")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5, err_msg=name,
        )


def test_fused_i8_dispatcher_falls_back_off_tpu():
    args = _setup_i8()
    out = fused_decode_attention_int8(*args, rotary_dim=RD)
    ref = _reference_i8(*args)
    for r, g in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5,
        )


def test_fused_i8_attention_matches_unfused_int8_attention():
    """The fused step's attention equals decode_attention_int8 run on the
    post-write cache (the composition the engine's unfused path uses)."""
    args = _setup_i8(seed=3, pos=(40, 200))
    q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos_v = args
    attn, kq2, ks2, vq2, vs2 = _fused_xla_i8(*args, rotary_dim=RD)

    def rope(x, c, s):
        xr, xp = x[..., :RD], x[..., RD:]
        half = RD // 2
        rot = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
        return jnp.concatenate([xr * c[:, None] + rot * s[:, None], xp], axis=-1)

    qr = rope(q, cos, sin)
    ref = decode_attention_int8(qr, kq2, ks2, vq2, vs2, pos_v)
    np.testing.assert_allclose(
        np.asarray(attn, np.float32), np.asarray(ref, np.float32),
        rtol=2e-5, atol=2e-5,
    )


# ---------------------------------------------------------------------------
# auto-chunk policy (round 4): chunk=256 at long context, within VMEM budget
# ---------------------------------------------------------------------------

from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk


def test_pick_decode_chunk_policy():
    # flagship (kvh=32, hd=64): 256 at long context, 128 below
    assert pick_decode_chunk(8448, 32, 64, 2) == 256
    assert pick_decode_chunk(2048, 32, 64, 2) == 256
    assert pick_decode_chunk(1024, 32, 64, 2) == 128
    # capacity must divide 256
    assert pick_decode_chunk(2048 + 128, 32, 64, 2) == 128
    # 7B-class hd=128: bf16 busts the VMEM budget, int8 codes fit
    assert pick_decode_chunk(8192, 32, 128, 2) == 128
    assert pick_decode_chunk(8192, 32, 128, 1) == 256


def test_fused_pallas_chunk256_matches_reference():
    """The 256-chunk program (auto-picked at capacity >= 2048) is numerically
    identical to the 128-chunk one."""
    t = 2048
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    q = jax.random.normal(ks[0], (B, H, HD), jnp.float32)
    k_new = jax.random.normal(ks[1], (B, KVH, HD), jnp.float32)
    v_new = jax.random.normal(ks[2], (B, KVH, HD), jnp.float32)
    kc = jax.random.normal(ks[3], (B, KVH, t, HD), jnp.float32)
    vc = jax.random.normal(ks[4], (B, KVH, t, HD), jnp.float32)
    pos_v = jnp.asarray((200, 2000), jnp.int32)
    angles = jax.random.uniform(ks[5], (B, RD // 2), maxval=3.0)
    ang = jnp.concatenate([angles, angles], axis=1)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    ref = _reference(q, k_new, v_new, cos, sin, kc, vc, pos_v)
    got = _fused_pallas(
        q, k_new, v_new, cos, sin, kc, vc, pos_v,
        rotary_dim=RD, chunk=256, interpret=True,
    )
    for name, r, g in zip(("attn", "k", "v"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5, err_msg=name
        )


# ---------------------------------------------------------------------------
# T-major cache layout (round 4): unpadded decode streaming
# ---------------------------------------------------------------------------

from ternary_vllm_tpu.ops.fused_decode_attention import (
    _fused_pallas_tm,
    _fused_pallas_i8_tm,
    fused_decode_attention_tmajor,
    fused_decode_attention_int8_tmajor,
)


@pytest.mark.parametrize("pos", [(5, 130), (0, 255), (127, 128)])
def test_fused_tmajor_interpret_matches_reference(pos):
    args = _setup(pos=pos)
    ref = _reference(*args)
    q, k_new, v_new, cos, sin, kc, vc, pos_v = args
    got = _fused_pallas_tm(
        q, k_new, v_new, cos, sin,
        jnp.swapaxes(kc, 2, 3).copy(), jnp.swapaxes(vc, 2, 3).copy(), pos_v,
        rotary_dim=RD, chunk=128, interpret=True,
    )
    names = ("attn", "k_cache", "v_cache")
    for i, (name, r, g) in enumerate(zip(names, ref, got)):
        g = np.asarray(g) if i == 0 else np.asarray(jnp.swapaxes(g, 2, 3))
        np.testing.assert_allclose(
            g, np.asarray(r), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_fused_tmajor_dispatcher_fallback():
    args = _setup()
    q, k_new, v_new, cos, sin, kc, vc, pos_v = args
    ref = _reference(*args)
    got = fused_decode_attention_tmajor(
        q, k_new, v_new, cos, sin,
        jnp.swapaxes(kc, 2, 3).copy(), jnp.swapaxes(vc, 2, 3).copy(), pos_v,
        rotary_dim=RD,
    )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(got[1], 2, 3)), np.asarray(ref[1]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("pos", [(5, 130), (127, 128)])
def test_fused_i8_tmajor_interpret_matches_rowmajor(pos):
    """The int8 T-major kernel matches the row-major int8 kernel bit-for-bit
    (same math, transposed code layout)."""
    args = _setup_i8(pos=pos)
    q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos_v = args
    ref = _fused_pallas_i8(
        q, k_new, v_new, cos, sin, kq.copy(), ks.copy(), vq.copy(), vs.copy(),
        pos_v, rotary_dim=RD, chunk=128, interpret=True,
    )
    got = _fused_pallas_i8_tm(
        q, k_new, v_new, cos, sin,
        jnp.swapaxes(kq, 2, 3).copy(), ks.copy(), jnp.swapaxes(vq, 2, 3).copy(),
        vs.copy(), pos_v, rotary_dim=RD, chunk=128, interpret=True,
    )
    names = ("attn", "kq", "ks", "vq", "vs")
    for i, (name, r, g) in enumerate(zip(names, ref, got)):
        if i in (1, 3):
            g = jnp.swapaxes(g, 2, 3)
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=2e-5, atol=2e-5, err_msg=name,
        )


def test_fused_i8_tmajor_dispatcher_fallback():
    args = _setup_i8()
    q, k_new, v_new, cos, sin, kq, ks, vq, vs, pos_v = args
    ref = fused_decode_attention_int8(
        q, k_new, v_new, cos, sin, kq.copy(), ks.copy(), vq.copy(), vs.copy(),
        pos_v, rotary_dim=RD,
    )
    got = fused_decode_attention_int8_tmajor(
        q, k_new, v_new, cos, sin,
        jnp.swapaxes(kq, 2, 3).copy(), ks.copy(), jnp.swapaxes(vq, 2, 3).copy(),
        vs.copy(), pos_v, rotary_dim=RD,
    )
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32), np.asarray(ref[0], np.float32),
        rtol=1e-5, atol=1e-5,
    )
