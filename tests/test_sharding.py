"""Tensor/data-parallel sharding on the virtual 8-device CPU mesh: sharded
forward and train step must match single-device results (net-new capability,
SURVEY.md §2 parallelism note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.parallel.sharding import phi_param_specs, shard_params

CFG = phi.TINY_PHI_CONFIG


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG)
    return params, specs


def test_mesh_construction():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"data": 2, "model": 4}


def test_param_specs_cover_tree(setup):
    params, _ = setup
    pspecs = phi_param_specs(params)
    # structurally zippable
    jax.tree_util.tree_map(
        lambda x, s: None, params, pspecs, is_leaf=lambda x: isinstance(x, P)
    )


def test_sharded_forward_matches_single_device(setup):
    params, specs = setup
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (4, 8)))
    ref, _ = phi.forward_tokens(params, CFG, specs, ids)

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(
        lambda p, i: phi.forward_tokens(p, CFG, phi.freeze_specs(specs), i),
        static_argnums=(),
    )(sharded, ids_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_sharded_qat_train_step_runs():
    from ternary_vllm_tpu.quant.quantize import QuantConfig, quantize_decoder_params
    from ternary_vllm_tpu.train.qat import TrainConfig, make_optimizer, make_train_step

    # local params: the train step donates its inputs (don't corrupt the fixture)
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat_params, qspecs = quantize_decoder_params(params, CFG, QuantConfig())
    tc = TrainConfig(lr=0.05, total_steps=10)
    tx = make_optimizer(tc)
    step = make_train_step(CFG, qspecs, tc, tx)

    mesh = make_mesh(dp=2, tp=4)
    qat_sharded = shard_params(qat_params, mesh)
    opt_state = tx.init(qat_sharded)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (4, 8)))
    batch = {
        "input_ids": jax.device_put(ids, NamedSharding(mesh, P("data", None))),
        "labels": jax.device_put(ids, NamedSharding(mesh, P("data", None))),
    }
    new_params, opt_state, metrics = step(qat_sharded, opt_state, batch)
    assert bool(metrics["finite"])
    assert jnp.isfinite(float(metrics["loss"]))

    # compare against unsharded step — rebuilt from scratch: device_put of a
    # replicated leaf may alias the source buffer, which donation then deletes
    params_b = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    qat_b, _ = quantize_decoder_params(params_b, CFG, QuantConfig())
    step2 = make_train_step(CFG, qspecs, tc, tx)
    ref_params, _, ref_metrics = step2(qat_b, tx.init(qat_b), {
        "input_ids": ids, "labels": ids,
    })
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_params["layers"][0]["fc1"]["latent"]),
        np.asarray(ref_params["layers"][0]["fc1"]["latent"]),
        rtol=1e-4, atol=1e-5,
    )


def test_hybrid_factorization():
    """hybrid_mesh's DCN/ICI split must be valid for every reachable case
    (VERDICT r1: the dp % n_proc != 0 branch used to silently build a wrong
    mesh)."""
    from ternary_vllm_tpu.parallel.multihost import _hybrid_factorization

    # data over DCN (the normal layout)
    f = _hybrid_factorization(dp=4, tp=4, n_proc=2)
    assert f == {"ici": (2, 4), "dcn": (2, 1)}
    # dp == n_proc
    f = _hybrid_factorization(dp=2, tp=8, n_proc=2)
    assert f == {"ici": (1, 8), "dcn": (2, 1)}
    # model spans DCN (dp smaller than process count)
    f = _hybrid_factorization(dp=1, tp=8, n_proc=2)
    assert f == {"ici": (1, 4), "dcn": (1, 2)}
    f = _hybrid_factorization(dp=2, tp=8, n_proc=4)
    assert f == {"ici": (1, 4), "dcn": (2, 2)}
    # invariant: prod(dcn) == n_proc, prod(ici)*prod(dcn) == dp*tp
    for dp, tp, n in [(4, 4, 2), (2, 8, 2), (1, 8, 2), (2, 8, 4), (8, 2, 8)]:
        f = _hybrid_factorization(dp, tp, n)
        assert f["dcn"][0] * f["dcn"][1] == n
        assert f["ici"][0] * f["dcn"][0] == dp
        assert f["ici"][1] * f["dcn"][1] == tp
    # unfactorable: explicit error, not a silently-wrong mesh
    with pytest.raises(ValueError):
        _hybrid_factorization(dp=3, tp=4, n_proc=2)
    with pytest.raises(ValueError):
        _hybrid_factorization(dp=2, tp=3, n_proc=4)
