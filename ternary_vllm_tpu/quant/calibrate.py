"""Offline calibration: FP weights → latent quantized weights + per-channel scales.

Semantics-parity reimplementation of the reference's ``linear_to_quantized``
(reference ``binary/modules.py:189-299``) as pure JAX functions over arrays in
the framework's contraction-first convention ``W: (K, N)`` (in-features, out-
features); "per-channel" means per output channel, i.e. reductions over axis 0.

* **binary** ({-1,+1}): scale = absmean of W — ``uniform`` gives one scalar for
  all channels, ``independent`` a per-channel vector (``modules.py:197-212``).
* **binary01** ({0,1}): scale = mean of the positive part (``modules.py:234-248``).
* **ternary** ({-1,0,+1}): iterative absmean ("modified k-means",
  ``modules.py:275-298``): start m = mean(|w|), repeat ``kmeans_iter`` times
  ``mask = |w| > m/2; m = mean(|w|[mask])``; scale = m, latent = clip(w/m, ±1).
* **weight smoothing** (binary flavors, ``modules.py:214-226``): latent weights
  are pre-scaled before the ±1 clip — ``none`` (1.0), a float, ``std``
  (1/std(W)), or ``natural`` (1/scale, per channel).

Latent weights are what QAT trains (via STE); hard-quantize + pack them for
inference with ``ops.packing``.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp


def _smoothing_factor(w, scaling, channel_scale):
    """Pre-scale applied to latent weights before the ±1 clip."""
    if scaling is None or scaling == "none":
        return 1.0
    if isinstance(scaling, (int, float)):
        return float(scaling)
    if scaling == "std":
        return 1.0 / jnp.std(w)
    if scaling == "natural":
        return 1.0 / channel_scale[None, :]
    raise ValueError(f"Unknown scaling method: {scaling}")


@functools.partial(jax.jit, static_argnames=("zero_one", "neuron_scale", "scaling"))
def calibrate_binary(
    w,
    zero_one: bool = False,
    neuron_scale: str = "uniform",
    scaling: Union[str, float, None] = "none",
):
    """Binary calibration. ``w: (K, N)`` → (latent ``(K, N)``, scale ``(N,)``)."""
    w = jnp.asarray(w, jnp.float32)
    k, n = w.shape
    if zero_one:
        m_pos = jnp.sum(jnp.where(w > 0, w, 0.0), axis=0)  # (N,)
        if neuron_scale == "uniform":
            scale = jnp.full((n,), jnp.sum(m_pos) / (k * n))
        elif neuron_scale == "independent":
            scale = m_pos / k
        else:
            raise ValueError(f"Unknown neuron scaling method: {neuron_scale}")
    else:
        absmean = jnp.sum(jnp.abs(w), axis=0)  # (N,)
        if neuron_scale == "uniform":
            scale = jnp.full((n,), jnp.sum(absmean) / (k * n))
        elif neuron_scale == "independent":
            scale = absmean / k
        else:
            raise ValueError(f"Unknown neuron scaling method: {neuron_scale}")
    factor = _smoothing_factor(w, scaling, scale)
    latent = jnp.clip(w * factor, -1.0, 1.0)
    return latent, scale


@functools.partial(jax.jit, static_argnames=("neuron_scale", "kmeans_iter"))
def calibrate_ternary(
    w,
    neuron_scale: str = "independent",
    kmeans_iter: int = 10,
):
    """Ternary iterative-absmean calibration. ``w: (K, N)`` → (latent, scale)."""
    w = jnp.asarray(w, jnp.float32)
    k, n = w.shape
    abs_w = jnp.abs(w)
    if neuron_scale == "uniform":
        cols = abs_w.reshape(k * n, 1)  # one "channel" over all params
    elif neuron_scale == "independent":
        cols = abs_w
    else:
        raise ValueError(f"Unknown neuron scaling method: {neuron_scale}")

    m = jnp.mean(cols, axis=0)  # (n,) or (1,)
    for _ in range(kmeans_iter):
        mask = cols > m[None, :] / 2.0
        denom = jnp.maximum(jnp.sum(mask, axis=0), 1)
        m = jnp.sum(jnp.where(mask, cols, 0.0), axis=0) / denom

    scale = jnp.broadcast_to(m, (n,)) if m.shape[0] == 1 else m
    latent = jnp.clip(w / scale[None, :], -1.0, 1.0)
    return latent, scale


def calibrate_linear(
    w,
    mode: str = "ternary",
    neuron_scale: Optional[str] = None,
    scaling: Union[str, float, None] = "none",
    kmeans_iter: int = 10,
):
    """Dispatch on quantization mode; returns ``(latent (K,N), scale (N,))``.

    ``mode="smoothBinary"`` keeps the FP weights as latent (scale = 1): the
    smooth-binary scheme trains clipped latents and hard-signs at eval
    (reference ``binary/modules.py:112-146``).
    """
    w = jnp.asarray(w, jnp.float32)
    if mode == "ternary":
        return calibrate_ternary(w, neuron_scale or "independent", kmeans_iter)
    if mode == "binary":
        return calibrate_binary(w, False, neuron_scale or "uniform", scaling)
    if mode == "binary01":
        return calibrate_binary(w, True, neuron_scale or "uniform", scaling)
    if mode == "smoothBinary":
        return w, jnp.ones((w.shape[1],), jnp.float32)
    raise ValueError(f"Unknown quantization mode: {mode}")
