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
