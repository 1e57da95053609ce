"""Tensor-parallel sharding rules for Phi param pytrees.

Net-new vs the reference (which is single-device, SURVEY.md §2); the layout is
the standard Megatron pairing expressed as ``PartitionSpec``s for GSPMD:

* Wqkv / fc1: **column-parallel** — output features (attention heads /
  intermediate dim) sharded over the ``model`` axis; bias/scale sharded too.
* out_proj / fc2: **row-parallel** — contraction dim sharded; XLA inserts the
  psum/reduce-scatter.  For *packed* row-parallel weights the uint8 buffer is
  sharded along S, which is only correct if each K-shard was **packed
  per-shard** (``pack_decoder_params(..., shards=tp)``) so that plane offsets
  stay local — SURVEY.md §7 "hard part 5".
* KV cache: heads sharded over ``model``, batch over ``data``.
* Embedding/lm_head: vocab-sharded lm_head, replicated wte + LNs.

Use with ``jax.jit(..., in_shardings=...)`` or ``jax.device_put``; XLA lowers
the collectives onto ICI.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: column-parallel vs row-parallel assignment per quantizable linear
COL_PARALLEL = ("wqkv", "fc1")
ROW_PARALLEL = ("out_proj", "fc2")


def _linear_spec(name: str, p: Dict[str, Any]) -> Dict[str, P]:
    if name not in COL_PARALLEL and name not in ROW_PARALLEL:
        # fused single-chip formats (in_proj/out2) are replicated; use the
        # unfused layout for tensor parallelism
        return {key: P() for key in p}
    col = name in COL_PARALLEL
    spec = {}
    for key in p:
        if key in ("w", "latent", "packed"):
            spec[key] = P(None, "model") if col else P("model", None)
        elif key in ("b", "scale"):
            spec[key] = P("model") if col else P(None)
        else:
            spec[key] = P()
    return spec


def phi_param_specs(params) -> Dict[str, Any]:
    """PartitionSpec pytree matching a Phi param pytree (dense/qat/packed)."""
    layers = []
    for layer in params["layers"]:
        spec = {"ln": {"scale": P(None), "bias": P(None)}}
        for name, p in layer.items():
            if name == "ln":
                continue
            spec[name] = _linear_spec(name, p)
        layers.append(spec)
    return {
        "wte": P(None, None),
        "layers": layers,
        "lm_head": {
            "ln": {"scale": P(None), "bias": P(None)},
            "linear": {"w": P(None, "model"), "b": P("model")},
        },
    }


def cache_specs(cache) -> Any:
    """KV cache (B, H, T, *): batch over data, heads over model.  Handles both
    the bf16 2-tuple and int8 4-tuple (values + scales) layouts."""
    spec = P("data", "model", None, None)
    return [tuple(spec for _ in entry) for entry in cache]


def shard_params(params, mesh: Mesh):
    specs = phi_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_cache(cache, mesh: Mesh):
    specs = cache_specs(cache)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
