"""Metrics logging: console + JSONL always, wandb when available.

The reference logs through Lightning→wandb (SURVEY.md §5). wandb is not
in this image, so the JSONL file is the source of truth and a wandb run is
attached opportunistically (same metric names: train_<loss>, val_loss,
val_1step_rmse, val_all_rollout_rmse, lr).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        out_dir: str,
        run_name: str = "run",
        use_wandb: bool = False,
        wandb_config: Optional[Dict[str, Any]] = None,
        resume_id: Optional[str] = None,
        enabled: bool = True,
    ):
        """``enabled=False``: a no-op logger — multi-host non-main
        processes run the same Trainer code but must not write the shared
        JSONL or attach wandb runs."""
        self.enabled = enabled
        self._t0 = time.time()
        self.wandb = None
        self.run_id = resume_id
        self._f = None
        if not enabled:
            self.path = None
            return
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{run_name}.metrics.jsonl")
        self._f = open(self.path, "a")
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(
                    project=wandb_config.get("project", "graph-physics-tpu")
                    if wandb_config
                    else "graph-physics-tpu",
                    name=run_name,
                    config=wandb_config,
                    id=resume_id,
                    resume="allow" if resume_id else None,
                )
                self.run_id = self.wandb.id
            except Exception:
                self.wandb = None

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self.wandb is not None:
            self.wandb.finish()
