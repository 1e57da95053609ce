"""Device mesh construction.

The reference has no distributed layer at all (SURVEY.md §2: single-device
``device_map={"": DEVICE}``); scale-out here is net-new, built the TPU way:
a ``jax.sharding.Mesh`` over (data, model) axes with XLA collectives riding
ICI.  Multi-host extends the same mesh over DCN via ``jax.distributed``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh.  Defaults: tp = all devices, dp = 1.

    ``devices`` lets tests pass ``jax.devices("cpu")`` explicitly (virtual
    8-device CPU mesh) regardless of the default backend.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if tp is None and dp is None:
        dp, tp = 1, n
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    try:
        arr = mesh_utils.create_device_mesh((dp, tp), devices=devs)
    except Exception:
        arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, axis_names)
