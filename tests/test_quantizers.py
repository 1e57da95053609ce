"""STE quantizer forward/backward semantics (reference ``binary/modules.py:5-52``)."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.ops.quantizers import (
    sign_ste,
    sign_ste_sat,
    step_ste,
    tri_step_ste,
    tri_step_ste_sat,
)


X = jnp.array([-2.0, -1.0, -0.51, -0.5, -0.49, 0.0, 0.49, 0.5, 1.0, 2.0])


def test_sign_forward():
    np.testing.assert_array_equal(
        np.asarray(sign_ste(X)), np.where(np.asarray(X) >= 0, 1.0, -1.0)
    )


def test_step_forward():
    np.testing.assert_array_equal(
        np.asarray(step_ste(X)), (np.asarray(X) >= 0).astype(np.float32)
    )


def test_tri_step_forward():
    x = np.asarray(X)
    expected = (x >= 0.5).astype(np.float32) - (x <= -0.5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(tri_step_ste(X)), expected)


def test_ste_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(sign_ste(x) * jnp.arange(1.0, 11.0)))(X)
    np.testing.assert_allclose(np.asarray(g), np.arange(1.0, 11.0))
    g = jax.grad(lambda x: jnp.sum(tri_step_ste(x) * 3.0))(X)
    np.testing.assert_allclose(np.asarray(g), np.full(10, 3.0))


def test_saturated_ste_gradient_clips():
    g = jax.grad(lambda x: jnp.sum(sign_ste_sat(x)))(X)
    expected = (np.abs(np.asarray(X)) <= 1.0).astype(np.float32)
    np.testing.assert_allclose(np.asarray(g), expected)
    g = jax.grad(lambda x: jnp.sum(tri_step_ste_sat(x)))(X)
    np.testing.assert_allclose(np.asarray(g), expected)


def test_ste_under_jit_and_no_grad():
    # the reference's no-grad branch crashes on an undefined var (modules.py:7);
    # ours must work both with and without grad tracing
    y = jax.jit(sign_ste)(X)
    assert y.shape == X.shape
    val, grad = jax.value_and_grad(lambda x: jnp.sum(tri_step_ste(x)))(X)
    assert jnp.isfinite(val)
    assert grad.shape == X.shape
