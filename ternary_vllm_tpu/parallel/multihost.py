"""Multi-host (pod-slice) initialization and hybrid DCN/ICI meshes.

Net-new vs the reference (single-process only, SURVEY.md §2).  On TPU pods:

* every host runs the same program; :func:`init_multihost` wires them into one
  JAX runtime over DCN (coordinator discovery falls back to the TPU metadata
  env — the standard ``jax.distributed.initialize()`` zero-arg path);
* :func:`hybrid_mesh` builds a (data, model) mesh whose model axis stays
  inside each slice (ICI) and data axis spans slices (DCN) — collectives for
  tensor parallelism ride the fast interconnect, gradient/batch collectives
  the slow one (the scaling-book layout);
* the decode/train steps need no changes: the same ``shard_map``/GSPMD code
  runs, with per-host addressable shards.

Single-host fallback everywhere so the same entry points run on 1 chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed (no-op on a single process).

    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            if jax.process_count() == 1 and coordinator_address is None:
                # zero-arg initialize autodetects TPU pod env; harmless solo
                jax.distributed.initialize()
        except Exception:
            pass  # already initialized or single-process without pod env
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def hybrid_mesh(dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """(data, model) mesh with model inside a slice (ICI), data across (DCN).

    Defaults: model = devices-per-host... i.e. tp = local device count,
    dp = number of processes."""
    from jax.experimental import mesh_utils

    n_local = len(jax.local_devices())
    n_proc = jax.process_count()
    tp = tp or n_local
    dp = dp or (len(jax.devices()) // tp)
    if dp * tp != len(jax.devices()):
        raise ValueError(f"dp*tp={dp*tp} != {len(jax.devices())} devices")
    if n_proc > 1:
        shapes = _hybrid_factorization(dp, tp, n_proc)
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=shapes["ici"], dcn_mesh_shape=shapes["dcn"]
            )
        except ValueError:
            # virtual multi-process runs (jax.distributed over CPU devices)
            # have no slice_index attribution, so the slice-counting inside
            # create_hybrid_device_mesh rejects them — build the same
            # arrangement manually: group devices by process (the DCN
            # granule), processes fill the dcn factors, local devices the
            # ici factors
            devices = _manual_hybrid_mesh(shapes["ici"], shapes["dcn"])
    else:
        devices = mesh_utils.create_device_mesh((dp, tp))
    return Mesh(devices, ("data", "model"))


def _manual_hybrid_mesh(ici: tuple, dcn: tuple) -> np.ndarray:
    """(dcn_d, dcn_m) × (ici_d, ici_m) device grid with devices grouped by
    process — same layout contract as ``create_hybrid_device_mesh``."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape(dcn[0], dcn[1], ici[0], ici[1])
    arr = arr.transpose(0, 2, 1, 3)  # (dcn_d, ici_d, dcn_m, ici_m)
    return arr.reshape(dcn[0] * ici[0], dcn[1] * ici[1])


def _hybrid_factorization(dp: int, tp: int, n_proc: int) -> dict:
    """Split a (dp, tp) logical mesh into per-slice (ICI) and cross-slice
    (DCN) factors.  ``prod(dcn) == n_proc`` is required by
    ``create_hybrid_device_mesh`` (one DCN granule per process).

    Preferred: data spans processes (model stays on ICI).  If dp doesn't
    divide evenly, the model axis is allowed to span processes (slow — DCN
    collectives on the TP axis — but correct).  Anything else is an error,
    not a silently-wrong mesh."""
    if dp % n_proc == 0:
        return {"ici": (dp // n_proc, tp), "dcn": (n_proc, 1)}
    if n_proc % dp == 0 and tp % (n_proc // dp) == 0:
        span = n_proc // dp  # processes the model axis must cross
        return {"ici": (1, tp // span), "dcn": (dp, span)}
    raise ValueError(
        f"cannot factor mesh (dp={dp}, tp={tp}) over {n_proc} processes: "
        "need dp % n_proc == 0 (data over DCN) or n_proc % dp == 0 with "
        "tp % (n_proc//dp) == 0 (model spans DCN)"
    )
