"""Metric logging: JSONL file + console, with optional wandb passthrough.

The reference logs to wandb unconditionally; here wandb is optional behind the same
metric names (``mse_step``, ``train_mse_epoch``, ``{val,train}_mse_{in,out}_t``,
``*_dp{5,10,50}`` — the parity contract in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False, wandb_kwargs: Optional[dict] = None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                wandb.init(**(wandb_kwargs or {}))
                self._wandb = wandb
            except Exception as e:  # pragma: no cover - wandb not installed
                print(f"[logger] wandb unavailable ({e}); falling back to JSONL only.")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None, echo: bool = False):
        record = {"t": round(time.time() - self._t0, 3)}
        if step is not None:
            record["step"] = step
        record.update({k: float(v) if hasattr(v, "__float__") else v for k, v in metrics.items()})
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if echo:
            parts = " ".join(
                f"{k}={v:.3e}" if isinstance(v, float) else f"{k}={v}" for k, v in record.items()
            )
            print(parts, file=sys.stderr)

    def log_image(self, name: str, path: str, step: Optional[int] = None):
        """Record a figure: path in the JSONL stream, image upload when wandb is on."""
        record = {"t": round(time.time() - self._t0, 3), name: path}
        if step is not None:
            record["step"] = step
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(path)}, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
