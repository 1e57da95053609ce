"""Per-block MSE conversion report (reference conversion.py:144-145 parity
printing, asserted here) + gradient statistics helper."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.convert.parity import block_mse_report
from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    pack_decoder_params,
    quantize_decoder_params,
)
from ternary_vllm_tpu.utils.metrics import gradient_statistics

CFG = phi.TINY_PHI_CONFIG


def test_block_mse_report():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    packed, pspecs = pack_decoder_params(qat, qspecs, k_multiple=4)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (1, 6)))

    rep = block_mse_report(params, phi.layer_specs(CFG), packed, pspecs, CFG, ids)
    assert len(rep["per_block_mse"]) == CFG.num_hidden_layers
    assert all(np.isfinite(m) and m >= 0 for m in rep["per_block_mse"])
    assert rep["logits_mse"] > 0  # quantization error is nonzero
    # identical models -> zero error
    rep0 = block_mse_report(params, phi.layer_specs(CFG), params, phi.layer_specs(CFG), CFG, ids)
    assert rep0["logits_mse"] == 0.0


def test_gradient_statistics():
    grads = {"a": jnp.asarray([-2.0, 1.0]), "b": {"c": jnp.asarray([[3.0, -1.0]])}}
    s = gradient_statistics(grads)
    assert s["min"] == -2.0 and s["max"] == 3.0
    np.testing.assert_allclose(s["abs_mean"], (2 + 1 + 3 + 1) / 4)
