"""QAT training step: LR schedule parity, loss descent on an overfit task,
latent clipping, smoothBinary surgery (reference ``train.py``,
``binary/modules.py:149-186``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import QuantConfig, quantize_decoder_params
from ternary_vllm_tpu.train.qat import (
    TrainConfig,
    biobjective_gradients,
    clip_latent_params,
    cross_entropy_loss,
    lr_schedule,
    make_optimizer,
    make_train_step,
    smooth_binary_stats,
)

CFG = phi.TINY_PHI_CONFIG


def _ref_lr(step, max_steps, lr):
    # verbatim transcription of train.py:191-196
    x = step / max_steps
    if x < 0.1:
        return 0.1 * lr + 0.9 * lr * x / 0.1
    return 0.1 * lr + 0.9 * lr * (1 + math.cos(math.pi * (x - 0.1))) / 2


def test_lr_schedule_matches_reference():
    sched = lr_schedule(0.01, 1000)
    for step in [0, 10, 99, 100, 101, 500, 999, 1000]:
        np.testing.assert_allclose(
            float(sched(step)), _ref_lr(step, 1000, 0.01), rtol=1e-6
        )


def test_cross_entropy_ignores_minus_100():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.asarray([[-100, 2, -100, 3]])
    loss = cross_entropy_loss(logits, labels)
    # only positions 1..3 of shifted labels count: labels[1:] = [2,-100,3] -> 2 valid
    np.testing.assert_allclose(float(loss), math.log(8), rtol=1e-5)


def _quantized_setup(quantization="ternary"):
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qc = QuantConfig(quantization=quantization)
    return quantize_decoder_params(params, CFG, qc)


def test_qat_step_reduces_loss():
    qat_params, specs = _quantized_setup()
    tc = TrainConfig(lr=0.1, total_steps=50, quantization="ternary")
    tx = make_optimizer(tc)
    opt_state = tx.init(qat_params)
    step = make_train_step(CFG, specs, tc, tx)

    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (2, 12)))
    batch = {"input_ids": ids, "labels": ids}
    losses = []
    params = qat_params
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
        assert bool(metrics["finite"])
    assert losses[-1] < losses[0], losses
    # latent weights stay clipped
    lat = params["layers"][0]["fc1"]["latent"]
    assert float(jnp.max(jnp.abs(lat))) <= 1.0 + 1e-6


def test_qat_step_with_remat_matches():
    ids = jnp.asarray([[1, 2, 3, 4]])
    batch = {"input_ids": ids, "labels": ids}
    losses = {}
    for remat in (False, True):
        # fresh params each time: the train step donates its inputs
        qat_params, specs = _quantized_setup()
        tc = TrainConfig(lr=0.0, total_steps=10, remat=remat)
        tx = make_optimizer(tc)
        step = make_train_step(CFG, specs, tc, tx)
        _, _, m = step(qat_params, tx.init(qat_params), batch)
        losses[remat] = float(m["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_clip_latent_params():
    qat_params, specs = _quantized_setup()
    layers = qat_params["layers"]
    layers[0] = dict(layers[0])
    p = dict(layers[0]["fc1"])
    p["latent"] = p["latent"] * 100.0
    layers[0]["fc1"] = p
    clipped = clip_latent_params(qat_params, specs)
    assert float(jnp.max(jnp.abs(clipped["layers"][0]["fc1"]["latent"]))) <= 1.0


def test_smooth_binary_biobjective_and_stats():
    qat_params, specs = _quantized_setup("smoothBinary")
    grads = jax.tree_util.tree_map(jnp.ones_like, qat_params)
    new_grads = biobjective_gradients(grads, qat_params, specs)
    g = new_grads["layers"][0]["fc1"]["latent"]
    assert g.shape == qat_params["layers"][0]["fc1"]["latent"].shape
    assert bool(jnp.all(jnp.isfinite(g)))
    # non-latent grads get rescaled by (|g|+|bg|)/|g| — still finite
    assert bool(jnp.all(jnp.isfinite(new_grads["wte"])))

    total, frac = smooth_binary_stats(qat_params, specs)
    assert total > 0
    assert 0.0 <= float(frac) <= 1.0


def test_grad_accum_multisteps():
    qat_params, specs = _quantized_setup()
    tc = TrainConfig(lr=0.1, total_steps=50, grad_accum_steps=2)
    tx = make_optimizer(tc)
    opt_state = tx.init(qat_params)
    step = make_train_step(CFG, specs, tc, tx)
    ids = jnp.asarray([[1, 2, 3, 4]])
    batch = {"input_ids": ids, "labels": ids}
    p0 = np.asarray(qat_params["layers"][0]["fc1"]["latent"])  # copy pre-donation
    params, opt_state, _ = step(qat_params, opt_state, batch)
    # first micro-step accumulates only: params unchanged
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["fc1"]["latent"]), p0
    )
    params, opt_state, _ = step(params, opt_state, batch)
    assert not np.allclose(
        np.asarray(params["layers"][0]["fc1"]["latent"]), p0
    )
