"""Experiment metric logging (the reference's W&B hook, tfimm
train/trainer.py:8-12,:182-184 + kecam MyHistory callbacks.py:156-197 role).

No-egress environment: the primary sink is a JSONL file (one line per step /
epoch) plus the Trainer's history JSON. If a `wandb` package is importable
(it is not in this image) it is used transparently with the same calls.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    """log({'loss': ..., 'lr': ...}, step=N) -> JSONL (+wandb when present)."""

    def __init__(self, log_dir: str, project: Optional[str] = None, name: Optional[str] = None,
                 config: Optional[Dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name or 'metrics'}.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        try:  # pragma: no cover - wandb absent in this image
            import wandb

            self._wandb = wandb.init(project=project, name=name, config=config or {})
        except Exception:
            self._wandb = None
        if config:
            self._fh.write(json.dumps({"_config": config, "_time": time.time()}) + "\n")
            self._fh.flush()

    def log(self, metrics: Dict, step: Optional[int] = None):
        row = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        if step is not None:
            row["step"] = int(step)
        row["_time"] = time.time()
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def finish(self):
        self._fh.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()
