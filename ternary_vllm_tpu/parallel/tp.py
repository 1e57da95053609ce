"""Tensor-parallel packed matmuls under ``shard_map`` with per-shard packing.

SURVEY.md §7 "hard part 5": the planar-K packed layout interleaves K-planes,
so slicing a *globally packed* buffer along S does NOT give each device a
valid local packing.  The fix is **pack-per-shard**: split K into ``tp``
contiguous chunks, pack each chunk independently, and concatenate along S.
Row ``d*S_loc:(d+1)*S_loc`` of the result is exactly the planar packing of
K-chunk ``d`` — so under ``NamedSharding(P("model", None))`` every device
holds a self-contained packed block and the shard_map kernel runs the normal
Pallas unpack-matmul locally, followed by one ``psum`` over ICI.

Column-parallel needs no special packing (N-sharding never crosses the packed
byte layout).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ternary_vllm_tpu.ops.packing import pack_binary, pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import quantized_matmul


def _pack_sharded(w, shards: int, pack_fn) -> jnp.ndarray:
    k, n = w.shape
    if k % shards != 0:
        raise ValueError(f"K={k} not divisible by tp={shards}")
    k_loc = k // shards
    blocks = [pack_fn(w[i * k_loc : (i + 1) * k_loc]) for i in range(shards)]
    return jnp.concatenate(blocks, axis=0)


def pack_ternary_sharded(w, shards: int) -> jnp.ndarray:
    """Pack (K, N) ternary weights so S-row-sharding over ``shards`` devices
    yields a valid local planar packing on each."""
    return _pack_sharded(w, shards, pack_ternary)


def pack_binary_sharded(w, shards: int, zero_one: bool = False) -> jnp.ndarray:
    return _pack_sharded(w, shards, lambda x: pack_binary(x, zero_one=zero_one))


def tp_quantized_matmul_row(
    x,
    packed_sharded,
    mesh: Mesh,
    *,
    mode: str = "ternary",
    scale=None,
    bias=None,
    clip_val: Optional[float] = 100.0,
    act: Optional[str] = None,
    axis: str = "model",
    impl: str = "auto",
):
    """Row-parallel (K-sharded) packed matmul: local unpack-matmul + psum.

    x: (..., K) — sharded or replicated along K (in_spec shards it);
    packed_sharded: output of :func:`pack_ternary_sharded` with
    ``shards == mesh.shape[axis]``.  scale/bias/clip/act apply AFTER the psum
    (they are per-output-channel, reference ``binary/modules.py:101-109``)."""
    n = packed_sharded.shape[1]
    scale_arr = jnp.ones((n,), jnp.float32) if scale is None else scale
    bias_arr = jnp.zeros((n,), jnp.float32) if bias is None else bias

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P(None), P(None)),
        out_specs=P(None, None),
    )
    def _run(x_loc, packed_loc, scale_full, bias_full):
        partial_out = quantized_matmul(
            x_loc, packed_loc, mode=mode, scale=None, bias=None,
            clip_val=None, act=None, impl=impl,
        )
        full = jax.lax.psum(partial_out, axis)
        out = full * scale_full[None, :] + bias_full[None, :]
        if clip_val is not None:
            out = jnp.clip(out, -abs(clip_val), abs(clip_val))
        if act is not None:
            from ternary_vllm_tpu.ops.ternary_matmul import _ACTS

            out = _ACTS[act](out)
        return out.astype(x_loc.dtype)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _run(x2, packed_sharded, scale_arr.astype(jnp.float32), bias_arr.astype(jnp.float32))
    return out.reshape(*lead, n)


def tp_quantized_matmul_col(
    x,
    packed,
    mesh: Mesh,
    *,
    mode: str = "ternary",
    scale=None,
    bias=None,
    clip_val: Optional[float] = 100.0,
    act: Optional[str] = None,
    axis: str = "model",
    impl: str = "auto",
    gather_output: bool = True,
):
    """Column-parallel (N-sharded) packed matmul: local matmul on an N-shard,
    optional all-gather of outputs.  Normal (unsharded) packing is valid."""
    del gather_output  # out_specs assembles the global (M, N) either way
    n = packed.shape[1]
    scale_arr = jnp.ones((n,), jnp.float32) if scale is None else scale
    bias_arr = jnp.zeros((n,), jnp.float32) if bias is None else bias

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(None, axis), P(axis), P(axis)),
        out_specs=P(None, axis),
    )
    def _run(x_loc, packed_loc, scale_loc, bias_loc):
        return quantized_matmul(
            x_loc, packed_loc, mode=mode, scale=scale_loc, bias=bias_loc,
            clip_val=clip_val, act=act, impl=impl,
        )

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _run(x2, packed, scale_arr.astype(jnp.float32), bias_arr.astype(jnp.float32))
    return out.reshape(*lead, n)
