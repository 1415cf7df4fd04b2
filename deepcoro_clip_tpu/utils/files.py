"""Output-directory naming + resolved-config backup.

Reference behavior: ``{base}/{pipeline}/{project}/{run_id}_{timestamp}`` naming
and a fully-resolved config copy written into the run dir
(reference: utils/files_handler.py:14-90).
"""

from __future__ import annotations

import time
import uuid
from pathlib import Path

from deepcoro_clip_tpu.configs.base import BaseConfig


def generate_run_id() -> str:
    return uuid.uuid4().hex[:8]


def generate_output_dir_name(config: BaseConfig, run_id: str | None = None) -> Path:
    run_id = run_id or generate_run_id()
    ts = time.strftime("%Y%m%d-%H%M%S")
    return (
        Path(config.output_dir)
        / config.pipeline_project
        / (config.project or "default")
        / f"{run_id}_{ts}"
    )


def backup_config(config: BaseConfig, output_dir: Path) -> Path:
    """Write the fully-resolved config into the run dir (rank-0 only upstream)."""
    path = Path(output_dir) / "config.yaml"
    config.save_yaml(path)
    return path
