"""Contrastive pretraining project.

Reference: projects/contrastive_pretraining_project.py:29-347 — builds stats,
loaders, encoders, temperature param, param groups, optimizer, scheduler,
loss; dispatches TRAIN (with resume) / val / INFERENCE. Here all of that
assembly lives in the runner/bundle; the project stays the thin experiment
shell the registry expects.
"""

from __future__ import annotations

from typing import Any, Dict

from deepcoro_clip_tpu.projects.base import BaseProject
from deepcoro_clip_tpu.registry import ProjectRegistry
from deepcoro_clip_tpu.runners.contrastive import VideoContrastiveLearningRunner


@ProjectRegistry.register("DeepCORO_clip", "DeepCORO_clip_simple")
class ContrastivePretrainingProject(BaseProject):
    def run(self) -> Dict[str, Any]:
        output_dir = self._setup_project()
        runner = VideoContrastiveLearningRunner(self.config, output_dir=output_dir)
        self._backup_resolved()
        mode = self.config.run_mode
        if mode == "train":
            start = runner.maybe_resume()
            result = runner.train(start_epoch=start)
        elif mode in ("val", "test"):
            result = runner.validate(split=mode)
        elif mode == "inference":
            result = {"inference_rows": len(runner.inference())}
        else:
            raise ValueError(f"unknown run_mode {mode!r}")
        runner.logger.finish()
        return result
