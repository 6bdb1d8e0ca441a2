"""Experiment metric sink with a W&B-compatible surface.

Reference parity: `WandbLogger` (utils/utils.py:172-244) — namespaced metric
logging with min/max summaries per key. The wandb client is optional (absent
in this environment); when unavailable, metrics stream to
`<output_dir>/metrics.jsonl` and summaries to `<output_dir>/summary.json`,
keeping the call surface identical so drivers don't branch.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def _summary_mode(key: str) -> str | None:
    if "loss" in key:
        return "min"
    if "acc" in key or "score" in key:
        return "max"
    return None


class ExperimentLogger:
    def __init__(self, cfg: Any, output_dir: str | None = None, enable: bool = True):
        self.enable = enable
        self.output_dir = output_dir or "."
        self.step = 0
        self._summary: dict[str, float] = {}
        self._wandb = None
        self._path = os.path.join(self.output_dir, "metrics.jsonl")

        if not enable:
            return
        os.makedirs(self.output_dir, exist_ok=True)
        try:  # optional wandb passthrough
            import wandb  # noqa: F401

            wandb_cfg = cfg.get("wandb", {}) if hasattr(cfg, "get") else {}
            self._wandb = wandb.init(
                project=wandb_cfg.get("project", "vlmo_tpu"),
                name=wandb_cfg.get("name", "run"),
                mode=wandb_cfg.get("mode", "offline"),
                config=cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg),
            )
        except Exception:
            self._wandb = None

    def log(self, head: str = "train", step: int | None = None, **metrics: float) -> None:
        if not self.enable:
            return
        if step is None:
            step = self.step
            self.step += 1
        record: dict[str, Any] = {"_step": step, "_time": time.time()}
        for k, v in metrics.items():
            if v is None:
                continue
            key = f"{head}/{k}"
            v = float(v)
            record[key] = v
            mode = _summary_mode(k)
            if mode == "min":
                self._summary[key] = min(self._summary.get(key, v), v)
            elif mode == "max":
                self._summary[key] = max(self._summary.get(key, v), v)
            else:
                self._summary[key] = v
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if not k.startswith("_")}, step=step)
        else:
            with open(self._path, "a") as f:
                f.write(json.dumps(record) + "\n")

    def update_config(self, cfg: Any) -> None:
        """Push a (resolved) config to the run (utils/utils.py:193-194)."""
        if not self.enable:
            return
        as_dict = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
        if self._wandb is not None:
            self._wandb.config.update(as_dict, allow_val_change=True)
        else:
            with open(os.path.join(self.output_dir, "config_update.json"), "w") as f:
                json.dump(as_dict, f, indent=2, default=str)

    def alert(self, title: str, text: str) -> None:
        """End-of-phase / anomaly alert (utils/utils.py:235-242). Without a
        wandb client the alert is appended to `<output_dir>/alerts.jsonl`."""
        if not self.enable:
            return
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.alert(
                    title=title, text=text,
                    level=wandb.AlertLevel.INFO, wait_duration=10,
                )
                return
            except Exception:
                pass
        with open(os.path.join(self.output_dir, "alerts.jsonl"), "a") as f:
            f.write(json.dumps({"_time": time.time(), "title": title,
                                "text": text}) + "\n")

    def finish(self) -> None:
        if not self.enable:
            return
        if self._wandb is not None:
            self._wandb.finish()
        else:
            with open(os.path.join(self.output_dir, "summary.json"), "w") as f:
                json.dump(self._summary, f, indent=2)
