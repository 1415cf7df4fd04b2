"""Experiment logging: JSONL local log + optional Weights & Biases.

The reference is W&B-centric with a rank-0-only real run
(reference: utils/wandb_wrapper.py:7-128). wandb is not available in every
environment, so the logger always writes ``metrics.jsonl`` into the run dir
(machine-readable history, the role of the reference's ValidationLogger,
utils/validation_logger.py:505-613) and mirrors to wandb when installed and
enabled.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: str | Path, use_wandb: bool = False,
                 config: Optional[Any] = None, is_ref_device: bool = True):
        self.dir = Path(output_dir)
        self.is_ref = is_ref_device
        self._wandb = None
        if self.is_ref:
            self.dir.mkdir(parents=True, exist_ok=True)
            self._file = open(self.dir / "metrics.jsonl", "a")
        else:
            self._file = None
        if use_wandb and self.is_ref:
            try:  # pragma: no cover - wandb not in test image
                import wandb

                self._wandb = wandb.init(
                    project=getattr(config, "project", "deepcoro_clip_tpu"),
                    entity=getattr(config, "entity", None) or None,
                    name=getattr(config, "name", None),
                    config=config.to_dict() if config else None,
                    dir=str(self.dir),
                )
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if not self.is_ref:
            return
        rec = {"ts": time.time(), "step": step}
        rec.update(
            {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
             for k, v in metrics.items()}
        )
        self._file.write(json.dumps(rec, default=str) + "\n")
        self._file.flush()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def log_media(self, key: str, path: str | Path,
                  step: Optional[int] = None, kind: str = "image") -> None:
        """Media panel logging (reference wandb_wrapper media path,
        utils/wandb_logger.py:807-906): records the artifact path in
        metrics.jsonl always; mirrors as a real wandb.Image/Video when a
        wandb run is active."""
        if not self.is_ref:
            return
        self.log({key: str(path)}, step=step)
        if self._wandb is not None:  # pragma: no cover - wandb absent here
            try:
                import wandb

                media = (wandb.Video(str(path)) if kind == "video"
                         else wandb.Image(str(path)))
                self._wandb.log({key: media}, step=step)
            except Exception:
                pass

    def finish(self) -> None:
        if self._file:
            self._file.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()
