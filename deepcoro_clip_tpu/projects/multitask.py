"""Multitask pretraining project
(reference: projects/multitask_pretraining_project.py:31-442)."""

from __future__ import annotations

from typing import Any, Dict

from deepcoro_clip_tpu.projects.base import BaseProject
from deepcoro_clip_tpu.registry import ProjectRegistry
from deepcoro_clip_tpu.runners.multitask import MultitaskRunner


@ProjectRegistry.register("DeepCORO_multitask")
class MultitaskPretrainingProject(BaseProject):
    def run(self) -> Dict[str, Any]:
        output_dir = self._setup_project()
        runner = MultitaskRunner(self.config, output_dir=output_dir)
        self._backup_resolved()
        if self.config.run_mode == "train":
            result = runner.train(start_epoch=runner.maybe_resume())
        else:
            result = runner.validate()
        runner.logger.finish()
        return result
