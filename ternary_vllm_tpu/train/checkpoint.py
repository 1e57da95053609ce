"""Training checkpoint/resume.

The reference only saves at the end of training (``train.py:336-338``) and has
no resume path (SURVEY.md §5).  Here: periodic orbax checkpoints of
(params, opt_state, step) with retention, and exact resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def save_train_state(path: str, step: int, params, opt_state, keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step:08d}"), {"params": params, "opt_state": opt_state})
    ckptr.wait_until_finished()
    # retention: drop oldest beyond `keep`
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")
    )
    import shutil

    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(path, f"step_{s:08d}"), ignore_errors=True)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")]
    return max(steps) if steps else None


def restore_train_state(
    path: str, step: Optional[int] = None, template: Optional[Tuple[Any, Any]] = None
) -> Tuple[int, Any, Any]:
    """Returns (step, params, opt_state); raises if nothing to restore.

    ``template=(params, opt_state)`` (e.g. fresh init + ``tx.init``) restores
    into the exact pytree structure — required to recover optax NamedTuple
    states, which orbax would otherwise return as plain dicts."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.StandardCheckpointer()
    target = None
    if template is not None:
        params_t, opt_t = template
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x,
            {"params": params_t, "opt_state": opt_t},
        )
    state = ckptr.restore(os.path.join(path, f"step_{step:08d}"), target)
    return step, state["params"], state["opt_state"]
