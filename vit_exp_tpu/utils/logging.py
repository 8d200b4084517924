"""Metric logging: wandb when importable, JSONL on disk always.

The reference logs a per-step dict to wandb (CTCLIPTrainer.py:650-651,720,
run_train.py:90-114).  wandb is not installed in this image, so the logger
degrades to a JSONL stream any dashboard can tail, with the same keys."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(
        self,
        results_folder: str,
        *,
        project: str = "vit_exp_tpu",
        exp_name: str = "default",
        use_wandb: bool = True,
        enabled: bool = True,
    ):
        """enabled=False makes every method a no-op — multihost trainers
        pass is_main_process() so non-zero processes run the identical
        (collective) program without racing on metrics.jsonl / wandb."""
        self.enabled = enabled
        self._file = None
        self._wandb = None
        if not enabled:
            self.jsonl_path = os.path.join(results_folder, "metrics.jsonl")
            return
        os.makedirs(results_folder, exist_ok=True)
        self.jsonl_path = os.path.join(results_folder, "metrics.jsonl")
        self._file = open(self.jsonl_path, "a")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=exp_name, dir=results_folder
                )
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict, step: Optional[int] = None):
        if not self.enabled:
            return
        record = {"_time": time.time()}
        if step is not None:
            record["step"] = int(step)
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._file is not None:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
