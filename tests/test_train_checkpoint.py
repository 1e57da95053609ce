"""Training checkpoint/resume: save mid-run, restore, and verify the resumed
run produces bit-identical parameters to an uninterrupted run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import QuantConfig, quantize_decoder_params
from ternary_vllm_tpu.train.checkpoint import (
    latest_step,
    restore_train_state,
    save_train_state,
)
from ternary_vllm_tpu.train.qat import TrainConfig, make_optimizer, make_train_step

CFG = phi.TINY_PHI_CONFIG


def _setup():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    return quantize_decoder_params(params, CFG, QuantConfig())


def _batch(i):
    rng = np.random.default_rng(i)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)))
    return {"input_ids": ids, "labels": ids}


def test_resume_is_bit_identical(tmp_path):
    qat_params, specs = _setup()
    tc = TrainConfig(lr=0.05, total_steps=10)
    tx = make_optimizer(tc)
    step_fn = make_train_step(CFG, specs, tc, tx)

    # uninterrupted: 4 steps
    p, s = qat_params, tx.init(qat_params)
    for i in range(4):
        p, s, _ = step_fn(p, s, _batch(i))
    ref = np.asarray(p["layers"][0]["fc1"]["latent"])

    # interrupted: 2 steps, save, restore, 2 more
    qat_params2, _ = _setup()
    p2, s2 = qat_params2, tx.init(qat_params2)
    for i in range(2):
        p2, s2, _ = step_fn(p2, s2, _batch(i))
    save_train_state(str(tmp_path), 2, p2, s2)
    assert latest_step(str(tmp_path)) == 2

    template_params, _ = _setup()
    step, p3, s3 = restore_train_state(
        str(tmp_path), template=(template_params, tx.init(template_params))
    )
    assert step == 2
    for i in range(2, 4):
        p3, s3, _ = step_fn(p3, s3, _batch(i))
    np.testing.assert_array_equal(
        np.asarray(p3["layers"][0]["fc1"]["latent"]), ref
    )


def test_retention(tmp_path):
    qat_params, specs = _setup()
    tc = TrainConfig(lr=0.01, total_steps=10)
    tx = make_optimizer(tc)
    opt_state = tx.init(qat_params)
    for step in (1, 2, 3, 4, 5):
        save_train_state(str(tmp_path), step, qat_params, opt_state, keep=2)
    assert latest_step(str(tmp_path)) == 5
    import os

    remaining = sorted(d for d in os.listdir(tmp_path) if d.startswith("step_"))
    assert remaining == ["step_00000004", "step_00000005"]
