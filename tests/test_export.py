"""Export artifacts: orbax checkpoint roundtrip + jax.export signature
roundtrip (the reference's TFLite-export capability, ``convert.py:107-166``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.convert.export import (
    export_signatures,
    load_checkpoint,
    load_exported,
    save_checkpoint,
    save_exported,
)
from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    pack_decoder_params,
    quantize_decoder_params,
)

CFG = phi.TINY_PHI_CONFIG


def _packed_setup():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    return pack_decoder_params(qat, qspecs, k_multiple=4)


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    packed, specs = _packed_setup()
    save_checkpoint(str(tmp_path / "ckpt"), packed, CFG, specs)
    params2, cfg2, specs2 = load_checkpoint(str(tmp_path / "ckpt"))
    assert cfg2 == CFG
    assert specs2[0]["fc1"].kind == "packed"
    assert specs2[0]["fc1"].mode == "ternary"

    ids = jnp.asarray([[1, 2, 3]])
    ref, _ = phi.forward_tokens(packed, CFG, specs, ids)
    out, _ = phi.forward_tokens(params2, CFG, specs2, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_exported_signatures_roundtrip(tmp_path):
    packed, specs = _packed_setup()
    blobs = export_signatures(
        packed, CFG, specs, batch=1, prompt_len=4, max_len=16, dtype=jnp.float32
    )
    assert set(blobs) == {"empty_cache", "compute_embeddings", "call"}
    save_exported(str(tmp_path / "sig"), blobs)
    sigs = load_exported(str(tmp_path / "sig"))

    # run the deserialized artifact without the model code path
    cache = sigs["empty_cache"].call()
    flat_params = packed
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    emb = sigs["compute_embeddings"].call(flat_params, ids)
    logits, cache = sigs["call"].call(flat_params, emb[:, :1], cache, jnp.int32(0))
    assert logits.shape == (1, 1, CFG.vocab_size)

    # parity with the live model
    live_cache = phi.init_cache(CFG, 1, 16, jnp.float32)
    ref_logits, _ = phi.forward(
        packed, CFG, specs, phi.embed_tokens(packed, ids)[:, :1], live_cache, 0
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-5
    )


def test_v1_checkpoint_dense_clip_migrated(tmp_path):
    """format_version-1 checkpoints saved dense specs with the dataclass
    default clip_val=100.0 but ran unclipped; loading must null the clip so
    numerics are preserved (ADVICE r4)."""
    import json
    import os

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.convert import export

    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg)
    specs = phi.layer_specs(cfg)  # dense default: clip_val None via DENSE? ensure some dense
    path = str(tmp_path / "v1ckpt")
    export.save_checkpoint(path, params, cfg, specs)
    # rewrite the sidecar as a v1 artifact with the old buggy dense clip
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    meta["format_version"] = 1
    for layer in meta["specs"]:
        for kw in layer.values():
            if kw["kind"] == "dense":
                kw["clip_val"] = 100.0
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    _, _, loaded_specs = export.load_checkpoint(path)
    for layer in loaded_specs:
        for s in layer.values():
            if s.kind == "dense":
                assert s.clip_val is None
    # v2 artifacts preserve an intentional dense clip
    specs2 = tuple(
        {n: phi.LinearSpec(kind="dense", clip_val=7.5) for n in layer}
        for layer in export._specs_from_json(meta["specs"], 2)
    )
    path2 = str(tmp_path / "v2ckpt")
    export.save_checkpoint(path2, params, cfg, specs2)
    _, _, loaded2 = export.load_checkpoint(path2)
    assert all(s.clip_val == 7.5 for layer in loaded2 for s in layer.values())
