"""shard_map tensor-parallel packed matmuls on the 8-device CPU mesh:
per-shard packing correctness (SURVEY.md §7 hard part 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.ops.packing import pack_ternary, unpack_ternary
from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.parallel.tp import (
    pack_binary_sharded,
    pack_ternary_sharded,
    tp_quantized_matmul_col,
    tp_quantized_matmul_row,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, tp=4, devices=jax.devices()[:4], axis_names=("data", "model"))


def _case(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.integers(-1, 2, size=(k, n)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
    bias = (rng.normal(size=(n,)) * 0.1).astype(np.float32)
    return x, w, scale, bias


def test_pack_sharded_local_blocks_valid():
    """Each S-shard of the sharded packing must decode to its own K-chunk."""
    rng = np.random.default_rng(1)
    w = rng.integers(-1, 2, size=(64, 8)).astype(np.float32)
    packed = pack_ternary_sharded(jnp.asarray(w), shards=4)
    s_loc = packed.shape[0] // 4
    for d in range(4):
        block = packed[d * s_loc : (d + 1) * s_loc]
        np.testing.assert_array_equal(
            np.asarray(unpack_ternary(block, 16)), w[d * 16 : (d + 1) * 16]
        )


def test_row_parallel_matches_dense(mesh):
    x, w, scale, bias = _case(4, 64, 16)
    packed = pack_ternary_sharded(jnp.asarray(w), shards=4)
    out = tp_quantized_matmul_row(
        jnp.asarray(x), packed, mesh, scale=jnp.asarray(scale), bias=jnp.asarray(bias)
    )
    ref = np.clip(x @ w * scale + bias, -100, 100)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_row_parallel_with_act(mesh):
    x, w, scale, bias = _case(3, 32, 8, seed=2)
    packed = pack_ternary_sharded(jnp.asarray(w), shards=4)
    out = tp_quantized_matmul_row(
        jnp.asarray(x), packed, mesh,
        scale=jnp.asarray(scale), bias=jnp.asarray(bias), act="gelu_new",
    )
    ref = np.asarray(
        jax.nn.gelu(jnp.asarray(np.clip(x @ w * scale + bias, -100, 100)), approximate=True)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_col_parallel_matches_dense(mesh):
    x, w, scale, bias = _case(4, 32, 16, seed=3)
    packed = pack_ternary(jnp.asarray(w))  # normal packing is valid col-parallel
    out = tp_quantized_matmul_col(
        jnp.asarray(x), packed, mesh, scale=jnp.asarray(scale), bias=jnp.asarray(bias)
    )
    ref = np.clip(x @ w * scale + bias, -100, 100)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_binary_sharded_roundtrip():
    rng = np.random.default_rng(4)
    w = rng.choice([-1.0, 1.0], size=(64, 4)).astype(np.float32)
    from ternary_vllm_tpu.ops.packing import unpack_binary

    packed = pack_binary_sharded(jnp.asarray(w), shards=2)
    s_loc = packed.shape[0] // 2
    for d in range(2):
        block = packed[d * s_loc : (d + 1) * s_loc]
        np.testing.assert_array_equal(
            np.asarray(unpack_binary(block, 32)), w[d * 32 : (d + 1) * 32]
        )


def test_global_slice_is_NOT_valid_local_packing():
    """Documents WHY pack-per-shard exists: slicing a global packing along S
    mixes K-planes across shards."""
    rng = np.random.default_rng(5)
    w = rng.integers(-1, 2, size=(64, 4)).astype(np.float32)
    global_packed = pack_ternary(jnp.asarray(w))
    block0 = global_packed[:8]  # first S-shard of the global packing
    decoded = np.asarray(unpack_ternary(block0, 16))
    # the global planar layout puts rows {0..7, 16..23, 32..39, 48..55} here —
    # not rows 0..15 — so naive slicing would silently compute garbage
    assert not np.array_equal(decoded, w[:16])
