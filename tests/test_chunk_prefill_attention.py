"""Chunk-prefill attention kernel: parity vs masked dense attention for
bf16/f32 and int8 caches, GQA, batched starts (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.ops.chunk_prefill_attention import (
    _xla_fallback,
    chunk_prefill_attention,
    chunk_prefill_attention_int8,
)


def _setup(b=1, h=4, kvh=4, t=128, cap=512, start=130, hd=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, t, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, kvh, cap, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, kvh, cap, hd), jnp.float32)
    return q, k, v, jnp.full((b,), start, jnp.int32)


def test_matches_dense_fallback():
    q, k, v, start = _setup()
    out = chunk_prefill_attention(q, k, v, start, impl="pallas")
    ref = _xla_fallback(q, k, v, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_start_zero_fresh_sequence():
    q, k, v, _ = _setup(t=256, cap=256, start=0)
    out = chunk_prefill_attention(q, k, v, jnp.int32(0), impl="pallas")
    ref = _xla_fallback(q, k, v, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_garbage_beyond_live_region_ignored():
    """Cache slots past start+T hold garbage (pad rows, stale data); they sit
    at positions above every query and must not affect the output."""
    q, k, v, start = _setup(t=128, cap=512, start=64)
    out1 = chunk_prefill_attention(q, k, v, start, impl="pallas")
    k2 = k.at[:, :, 64 + 128 :].set(1e4)
    v2 = v.at[:, :, 64 + 128 :].set(-1e4)
    out2 = chunk_prefill_attention(q, k2, v2, start, impl="pallas")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_gqa_groups():
    q, k, v, start = _setup(h=8, kvh=2, t=128, cap=256, start=100)
    out = chunk_prefill_attention(q, k, v, start, impl="pallas")
    ref = _xla_fallback(q, k, v, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_batched_distinct_starts():
    q, k, v, _ = _setup(b=2, t=128, cap=512)
    start = jnp.asarray([0, 256], jnp.int32)
    out = chunk_prefill_attention(q, k, v, start, impl="pallas")
    ref = _xla_fallback(q, k, v, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_multi_tile_queries():
    q, k, v, start = _setup(t=384, cap=1024, start=512)
    out = chunk_prefill_attention(q, k, v, start, impl="pallas")
    ref = _xla_fallback(q, k, v, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_int8_cache_parity():
    from ternary_vllm_tpu.models.phi import _quantize_kv

    q, k, v, start = _setup(t=128, cap=512, start=200)
    kq, ksc = _quantize_kv(k)
    vq, vsc = _quantize_kv(v)
    out = chunk_prefill_attention_int8(q, kq, ksc, vq, vsc, start, impl="pallas")
    ref = chunk_prefill_attention_int8(q, kq, ksc, vq, vsc, start, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-3, atol=5e-3
    )


def test_unaligned_t_pads_to_tile():
    """T not a tile multiple (speculative verify windows, short suffixes):
    q pads to 128 rows internally; output matches dense on the real rows."""
    q, k, v, start = _setup(t=100, cap=512)
    out = chunk_prefill_attention(q, k, v, start, impl="pallas")
    assert out.shape == q.shape
    ref = _xla_fallback(q, k, v, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tiny_t_verify_window():
    q, k, v, start = _setup(t=5, cap=512, start=77)
    out = chunk_prefill_attention(q, k, v, start, impl="pallas")
    ref = _xla_fallback(q, k, v, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_unaligned_capacity_raises_or_falls_back():
    q, k, v, start = _setup(t=128, cap=500)
    with pytest.raises(ValueError, match="C % 256"):
        chunk_prefill_attention(q, k, v, start, impl="pallas")
    out = chunk_prefill_attention(q, k, v, start)  # auto: silent fallback
    assert out.shape == q.shape


def test_small_kernel_parity_bf16_and_int8():
    """The all-heads small-T kernel (t <= 32) matches dense, including GQA
    and batched distinct starts."""
    from ternary_vllm_tpu.models.phi import _quantize_kv

    for h, kvh in ((4, 4), (8, 2)):
        q, k, v, _ = _setup(b=2, h=h, kvh=kvh, t=7, cap=512)
        start = jnp.asarray([3, 200], jnp.int32)
        out = chunk_prefill_attention(q, k, v, start, impl="pallas")
        ref = _xla_fallback(q, k, v, start)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    q, k, v, start = _setup(t=9, cap=512, start=100)
    kq, ksc = _quantize_kv(k)
    vq, vsc = _quantize_kv(v)
    out = chunk_prefill_attention_int8(q, kq, ksc, vq, vsc, start, impl="pallas")
    ref = chunk_prefill_attention_int8(q, kq, ksc, vq, vsc, start, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-3, atol=5e-3
    )


def test_hg_matches_tiled_kernel():
    """The round-4 heads-grouped kernel (impl default for t > 32) agrees with
    the round-3 per-q-tile kernel and the dense fallback, across GQA and
    batched distinct starts."""
    for b, h, kvh, t, cap in ((1, 4, 4, 256, 1024), (2, 8, 2, 128, 512)):
        q, k, v, _ = _setup(b=b, h=h, kvh=kvh, t=t, cap=cap)
        start = jnp.asarray([cap - t - 3, 37][:b], jnp.int32)
        hg_out = chunk_prefill_attention(q, k, v, start, impl="pallas")
        tiled = chunk_prefill_attention(q, k, v, start, impl="pallas_tiled")
        ref = _xla_fallback(q, k, v, start)
        np.testing.assert_allclose(
            np.asarray(hg_out), np.asarray(tiled), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(hg_out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_hg_int8_matches_tiled_kernel():
    from ternary_vllm_tpu.models.phi import _quantize_kv

    q, k, v, start = _setup(t=128, cap=512, start=200)
    kq, ksc = _quantize_kv(k)
    vq, vsc = _quantize_kv(v)
    hg_out = chunk_prefill_attention_int8(q, kq, ksc, vq, vsc, start, impl="pallas")
    tiled = chunk_prefill_attention_int8(q, kq, ksc, vq, vsc, start, impl="pallas_tiled")
    np.testing.assert_allclose(
        np.asarray(hg_out, np.float32), np.asarray(tiled, np.float32),
        rtol=2e-5, atol=2e-5,
    )


def test_large_t_routes_to_tiled_kernel():
    """t > 1024 exceeds the hg kernel's scoped-vmem stack — auto/pallas must
    route to the per-q-tile kernel and stay correct (a 2048-bucket engine
    previously hit a compile-time VMEM OOM)."""
    q, k, v, _ = _setup(t=1152, cap=2048)
    start = jnp.int32(640)
    out = chunk_prefill_attention(q, k, v, start, impl="pallas")
    ref = _xla_fallback(q, k, v, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestTmajorSmall:
    """T-major small-T kernels (speculative verify windows on long-context
    engines, round-4 VERDICT weak #4): parity with the row-major fallback."""

    @pytest.mark.parametrize("kvh", [4, 2])
    @pytest.mark.parametrize("t", [1, 5, 32])
    def test_bf16_matches_fallback(self, kvh, t):
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            _xla_fallback,
            chunk_prefill_attention_tmajor,
        )

        h, hd, cap = 4, 16, 512
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(2, h, t, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, kvh, cap, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, kvh, cap, hd)), jnp.float32)
        start = jnp.asarray([100, 37], jnp.int32)
        k_t = k.transpose(0, 1, 3, 2)
        v_t = v.transpose(0, 1, 3, 2)
        out = chunk_prefill_attention_tmajor(q, k_t, v_t, start, impl="pallas")
        ref = _xla_fallback(q, k, v, start)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("kvh", [4, 1])
    def test_int8_matches_fallback(self, kvh):
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            chunk_prefill_attention_int8,
            chunk_prefill_attention_tmajor_int8,
        )

        h, hd, cap, t = 4, 16, 512, 5
        rng = np.random.default_rng(8)
        q = jnp.asarray(rng.normal(size=(1, h, t, hd)), jnp.float32)
        kq = jnp.asarray(rng.integers(-127, 128, (1, kvh, cap, hd)), jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (1, kvh, cap, hd)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.05, (1, kvh, 1, cap)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.05, (1, kvh, 1, cap)), jnp.float32)
        start = jnp.asarray([200], jnp.int32)
        out = chunk_prefill_attention_tmajor_int8(
            q, kq.transpose(0, 1, 3, 2), ks, vq.transpose(0, 1, 3, 2), vs, start,
            impl="pallas",
        )
        ref = chunk_prefill_attention_int8(q, kq, ks, vq, vs, start, impl="auto")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_large_t_raises(self):
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            chunk_prefill_attention_tmajor,
        )

        q = jnp.zeros((1, 4, 64, 16), jnp.float32)
        k_t = jnp.zeros((1, 4, 16, 512), jnp.float32)
        with pytest.raises(NotImplementedError, match="verify windows"):
            chunk_prefill_attention_tmajor(q, k_t, k_t, jnp.asarray([0]))


class TestV3QTileLoop:
    """Round-5 v3 kernel: in-kernel q-tile loop + capacity-divisor kv-chunk
    (lifts the round-4 scoped-VMEM cap; compiles chunk 2048; measured 2.1x
    the round-4 kernel at 8k live — BENCHMARKS.md prefill v3 table)."""

    @pytest.mark.parametrize("t,start0", [(129, 0), (640, 300), (1024, 3000), (2048, 1500)])
    def test_bf16_matches_fallback(self, t, start0):
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            _xla_fallback,
            chunk_prefill_attention,
        )

        h, kvh, hd, cap = 4, 4, 64, 8448
        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.normal(size=(1, h, t, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, kvh, cap, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, kvh, cap, hd)), jnp.float32)
        start = jnp.asarray([start0], jnp.int32)
        out = chunk_prefill_attention(q, k, v, start, impl="pallas_v3")
        ref = _xla_fallback(q, k, v, start)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("kvh", [2, 1])
    def test_gqa_int8_matches_fallback(self, kvh):
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            _xla_fallback,
            chunk_prefill_attention_int8,
        )

        h, hd, cap, t = 4, 64, 2048, 640
        rng = np.random.default_rng(12)
        q = jnp.asarray(rng.normal(size=(1, h, t, hd)), jnp.float32)
        kq = jnp.asarray(rng.integers(-127, 128, (1, kvh, cap, hd)), jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (1, kvh, cap, hd)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.03, (1, kvh, 1, cap)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.03, (1, kvh, 1, cap)), jnp.float32)
        start = jnp.asarray([500], jnp.int32)
        out = chunk_prefill_attention_int8(q, kq, ks, vq, vs, start, impl="pallas_v3")
        ks_t = ks.transpose(0, 1, 3, 2)
        vs_t = vs.transpose(0, 1, 3, 2)
        ref = _xla_fallback(
            q, (kq * ks_t).astype(q.dtype), (vq * vs_t).astype(q.dtype), start
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=3e-3)

    def test_ckv_policy(self):
        from ternary_vllm_tpu.ops.chunk_prefill_attention import _pick_v3_ckv

        assert _pick_v3_ckv(8448) == 1408
        assert _pick_v3_ckv(2048) == 1024
        assert _pick_v3_ckv(4352) == 256
        assert _pick_v3_ckv(16640) == 1280
        assert _pick_v3_ckv(100) == 0  # no 128-multiple divides it

    def test_vector_start_batch(self):
        from ternary_vllm_tpu.ops.chunk_prefill_attention import (
            _xla_fallback,
            chunk_prefill_attention,
        )

        h, kvh, hd, cap, t = 4, 4, 64, 2048, 256
        rng = np.random.default_rng(13)
        q = jnp.asarray(rng.normal(size=(2, h, t, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, kvh, cap, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, kvh, cap, hd)), jnp.float32)
        start = jnp.asarray([700, 64], jnp.int32)  # per-row positions
        out = chunk_prefill_attention(q, k, v, start, impl="pallas_v3")
        ref = _xla_fallback(q, k, v, start)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_v3_budget_anchors(self):
        """The hg budget is pinned by on-chip anchors (round 5): the
        measured-fastest 8448 config keeps hg=4, the high-GQA i8 case stays
        feasible, and the 16k-serving config that needs 17 MB of scoped
        vmem (bench_long cliff) is demoted to hg=2."""
        from ternary_vllm_tpu.ops.chunk_prefill_attention import _pick_v3_tile

        assert _pick_v3_tile(32, 1, 1024, 64, 1408, 2) == (128, 4)
        assert _pick_v3_tile(32, 1, 2048, 64, 1280, 2)[1] <= 2  # 16k, bf16
        assert _pick_v3_tile(1, 4, 640, 64, 1024, 1)[1] >= 1    # GQA i8
