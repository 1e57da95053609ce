"""Inference-artifact export: packed-weight checkpoint + AOT-exported signatures.

Capability parity with the reference's TFLite export (reference
``convert.py:107-166``: trace ``empty_cache`` / ``compute_embeddings`` /
``call`` as concrete functions and freeze them into a flatbuffer).  The
TPU-native artifact is:

* an **Orbax** checkpoint of the packed-weight pytree (uint8 buffers +
  scales/biases/LN/embeddings) plus a JSON sidecar with the model config and
  per-layer LinearSpecs;
* optionally, the same three signatures AOT-serialized with ``jax.export``
  (StableHLO), loadable without the Python model code.

The reference's three signatures map 1:1:
  ``empty_cache``         -> :func:`ternary_vllm_tpu.models.phi.init_cache`
  ``compute_embeddings``  -> :func:`ternary_vllm_tpu.models.phi.embed_tokens`
  ``call``                -> :func:`ternary_vllm_tpu.models.phi.forward`
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.models import phi

#: checkpoint metadata format.  2: dense specs' clip_val is meaningful
#: (phi.apply_linear clips dense outputs); 1: dense clip_val was saved but
#: ignored at runtime — migrated to None on load.
FORMAT_VERSION = 2


def _specs_to_json(specs) -> list:
    out = []
    for layer in phi._spec_dicts(specs):
        out.append({name: dataclasses.asdict(s) for name, s in layer.items()})
    return out


def _specs_from_json(data, format_version: int = FORMAT_VERSION) -> Tuple[Dict[str, phi.LinearSpec], ...]:
    def mk(kw):
        # format 1 predates the dense branch honoring clip_val: dense specs
        # were saved with the dataclass default clip_val=100.0 but ran
        # unclipped.  Preserve those numerics by nulling the clip on load;
        # format >= 2 dense specs carry an intentional clip (set by
        # quantize.unpack_decoder_params for prefill-path parity).
        if format_version < 2 and kw.get("kind", "dense") == "dense":
            kw = dict(kw, clip_val=None)
        return phi.LinearSpec(**kw)

    return tuple({name: mk(kw) for name, kw in layer.items()} for layer in data)


def save_checkpoint(path: str, params, config: phi.PhiConfig, specs) -> None:
    """Write packed params + config/specs metadata (the analogue of the
    reference's ``save_pretrained`` + tflite artifact, ``train.py:336-338``,
    ``convert.py:157-166``)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params)
    ckptr.wait_until_finished()
    meta = {
        "config": dataclasses.asdict(config),
        "specs": _specs_to_json(specs),
        "format_version": FORMAT_VERSION,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str):
    """Returns (params, config, specs)."""
    path = os.path.abspath(path)
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    config = phi.PhiConfig(**meta["config"])
    specs = _specs_from_json(meta["specs"], meta.get("format_version", 1))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"))
    return params, config, specs


def export_signatures(
    params,
    config: phi.PhiConfig,
    specs,
    batch: int = 1,
    prompt_len: int = 64,
    max_len: int = 2048,
    dtype=jnp.bfloat16,
) -> Dict[str, bytes]:
    """AOT-serialize the three inference signatures with ``jax.export``.

    Returns name -> serialized StableHLO bytes; deserialize with
    ``jax.export.deserialize(blob).call(...)``."""
    from jax import export as jexport

    frozen = phi.freeze_specs(specs)
    d = config.hidden_size

    def empty_cache():
        return phi.init_cache(config, batch, max_len, dtype)

    def compute_embeddings(params, ids):
        return phi.embed_tokens(params, ids)

    def call(params, embeds, cache, pos):
        return phi.forward(params, config, frozen, embeds, cache, pos)

    cache_shape = jax.eval_shape(empty_cache)
    params_shape = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    out = {}
    out["empty_cache"] = jexport.export(jax.jit(empty_cache))().serialize()
    out["compute_embeddings"] = jexport.export(jax.jit(compute_embeddings))(
        params_shape, jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32)
    ).serialize()
    out["call"] = jexport.export(jax.jit(call))(
        params_shape,
        jax.ShapeDtypeStruct((batch, 1, d), dtype),
        cache_shape,
        jax.ShapeDtypeStruct((), jnp.int32),
    ).serialize()
    return out


def save_exported(path: str, blobs: Dict[str, bytes]) -> None:
    os.makedirs(path, exist_ok=True)
    for name, blob in blobs.items():
        with open(os.path.join(path, f"{name}.stablehlo"), "wb") as f:
            f.write(blob)


def load_exported(path: str) -> Dict[str, Any]:
    from jax import export as jexport

    out = {}
    for fn in os.listdir(path):
        if fn.endswith(".stablehlo"):
            with open(os.path.join(path, fn), "rb") as f:
                out[fn[: -len(".stablehlo")]] = jexport.deserialize(f.read())
    return out
