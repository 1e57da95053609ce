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
