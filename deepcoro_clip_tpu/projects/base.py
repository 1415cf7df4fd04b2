"""Project base: run-dir setup + config backup + run dispatch.

Reference: projects/base_project.py:12-103 — synchronized W&B run id, rank-0
output-dir creation, config backup, path broadcast, barrier. Single-process
SPMD removes the broadcast/barrier; multi-host setups derive the same run dir
from the seed+timestamp on every host.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

from deepcoro_clip_tpu.utils.files import backup_config, generate_output_dir_name


class BaseProject:
    def __init__(self, config):
        self.config = config
        self.output_dir: Optional[Path] = None

    def _setup_project(self) -> Path:
        self.output_dir = generate_output_dir_name(self.config)
        if self.config.is_ref_device:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            backup_config(self.config, self.output_dir)
        return self.output_dir

    def _backup_resolved(self) -> None:
        """Refresh the config backup AFTER runner construction, so computed
        fields (dataset_mean/std from StatsDataset) land in the backup — the
        reference requires precomputed stats for val/test/inference reruns
        (utils/video_project.py:38-43), and the backup is how they travel."""
        if self.output_dir is not None and self.config.is_ref_device:
            backup_config(self.config, self.output_dir)

    def run(self) -> Dict[str, Any]:  # pragma: no cover - abstract
        raise NotImplementedError
