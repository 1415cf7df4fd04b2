"""Linear probing project (reference: projects/linear_probing_project.py:29-544)."""

from __future__ import annotations

from typing import Any, Dict

from deepcoro_clip_tpu.projects.base import BaseProject
from deepcoro_clip_tpu.registry import ProjectRegistry
from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner


@ProjectRegistry.register("DeepCORO_video_linear_probing")
class LinearProbingProject(BaseProject):
    def run(self) -> Dict[str, Any]:
        output_dir = self._setup_project()
        runner = LinearProbingRunner(self.config, output_dir=output_dir)
        self._backup_resolved()
        mode = self.config.run_mode
        if mode == "train":
            result = runner.train(start_epoch=runner.maybe_resume())
        elif mode in ("val", "test"):
            result = runner.validate(split=mode)
        elif mode == "inference":
            result = {"rows": len(runner.inference())}
        else:
            raise ValueError(f"unknown run_mode {mode!r}")
        runner.logger.finish()
        return result
