"""Straight-through-estimator quantizers as ``jax.custom_vjp`` functions.

Capability parity with the reference's STE family (reference
``binary/modules.py:5-52``: ``sign_ste``, ``step_ste``, ``tri_step_ste`` and
the ``_sat`` variants built from ``x + clip(x) - detach(clip(x))``), minus its
latent bug (the reference's no-grad branches reference an undefined variable
``t`` — ``binary/modules.py:7,15,...`` — which we do not replicate).

Semantics:
* forward is the hard quantizer;
* backward is the identity (plain STE) or the derivative of ``clip(x, ±1)``
  (saturated STE: gradient zeroed where ``|x| > 1``).

These are pure functions usable inside ``jit`` / ``grad`` / ``vmap`` and under
``jax.checkpoint``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sign(x):
    # x >= 0 -> +1 else -1 (matches torch `(x >= 0) * 2 - 1`)
    return (x >= 0.0).astype(x.dtype) * 2.0 - 1.0


def _step(x):
    return (x >= 0.0).astype(x.dtype)


def _tri_step(x):
    return (x >= 0.5).astype(x.dtype) - (x <= -0.5).astype(x.dtype)


def _make_ste(fwd_fn, saturated: bool):
    @jax.custom_vjp
    def ste(x):
        return fwd_fn(x)

    def fwd(x):
        return fwd_fn(x), (x if saturated else None)

    def bwd(res, g):
        if saturated:
            x = res
            g = jnp.where(jnp.abs(x) <= 1.0, g, jnp.zeros_like(g))
        return (g,)

    ste.defvjp(fwd, bwd)
    return ste


sign_ste = _make_ste(_sign, saturated=False)
step_ste = _make_ste(_step, saturated=False)
tri_step_ste = _make_ste(_tri_step, saturated=False)
sign_ste_sat = _make_ste(_sign, saturated=True)
step_ste_sat = _make_ste(_step, saturated=True)
tri_step_ste_sat = _make_ste(_tri_step, saturated=True)

#: name -> quantizer, mirroring the reference's choice of quantizer per
#: quantization mode (reference ``binary/modules.py:55-146``).
QUANTIZERS = {
    "binary": sign_ste,
    "binary01": step_ste,
    "ternary": tri_step_ste,
    "binary_sat": sign_ste_sat,
    "binary01_sat": step_ste_sat,
    "ternary_sat": tri_step_ste_sat,
}
