"""Structured metric logging.

The reference logs per-step loss means to wandb (e.g.
train_full_pose_norm_flow.py:100-111). Here metrics go to a JSONL file (one
record per epoch, same loss-key names for comparability) with optional
wandb mirroring when the package + an active login are available.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, path: str | Path | None, use_wandb: bool = False,
                 project: str = "LInKs", run_name: str | None = None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = self.path.open("a")
        else:
            self._fh = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project)
                if run_name:
                    wandb.run.name = run_name + " " + wandb.run.name
            except Exception:
                self._wandb = None

    def log(self, record: dict, step: int | None = None):
        rec = {k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in record.items()}
        rec["_time"] = time.time()
        if step is not None:
            rec["_step"] = step
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb:
            self._wandb.log(record)

    def set_config(self, cfg: dict):
        if self._wandb:
            for k, v in cfg.items():
                setattr(self._wandb.config, k, v)
        if self._fh:
            self._fh.write(json.dumps({"_config": cfg}) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb:
            self._wandb.finish()
