"""Metrics logging: stdout + JSONL, optional wandb if importable.

Parity with the reference's observability (reference ``train.py:232-251,
310-334``: train/val loss, lr, samples, smoothBinary convergence via wandb) —
without requiring wandb (this image may not have it; we degrade to JSONL).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, run_name: str = "run", use_wandb: bool = False, out_dir: str = "runs"):
        self.run_name = run_name
        self.use_wandb = False
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project="ternary-vllm-tpu", name=run_name)
                self.use_wandb = True
            except Exception:
                pass
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, f"{run_name}.jsonl")
        self._fh: Optional[object] = None

    def log(self, step: int, **metrics):
        rec = {"step": step, "ts": time.time(), **{k: float(v) for k, v in metrics.items()}}
        with open(self._path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        if self.use_wandb:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self.use_wandb:
            self._wandb.finish()


def gradient_statistics(grads) -> dict:
    """min / max / abs-mean over a gradient pytree (parity with the
    reference's unused helper, ``utils/model.py:4-27``)."""
    import jax
    import jax.numpy as jnp

    leaves = [g for g in jax.tree_util.tree_leaves(grads) if hasattr(g, "dtype")]
    if not leaves:
        return {"min": 0.0, "max": 0.0, "abs_mean": 0.0}
    gmin = min(float(jnp.min(g)) for g in leaves)
    gmax = max(float(jnp.max(g)) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    count = sum(g.size for g in leaves)
    return {"min": gmin, "max": gmax, "abs_mean": total / max(count, 1)}
