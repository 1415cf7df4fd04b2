"""CLI entry point.

Reference: scripts/main.py:38-143 — register submodules, parse config, seed,
DDP init, build Project from the registry, run, clean up. TPU: no process
groups to init — one SPMD program; the mesh is built inside the runner.

Usage:
    python -m deepcoro_clip_tpu.main --base_config config/clip/base_config.yaml \
        [--run_mode train] [--any_config_field value ...]
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

from deepcoro_clip_tpu.configs.parser import parse_config
from deepcoro_clip_tpu.registry import ProjectRegistry, register_all
from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults
from deepcoro_clip_tpu.utils.seed import set_seed


def main(argv: Optional[Sequence[str]] = None):
    register_all()
    setup_tpu_defaults()
    config = parse_config(argv)
    set_seed(config.seed)
    project_cls = ProjectRegistry.get(config.pipeline_project)
    project = project_cls(config)
    result = project.run()
    if config.is_ref_device and isinstance(result, dict):
        printable = {
            k: v for k, v in result.items() if isinstance(v, (int, float, str))
        }
        print(f"[deepcoro_clip_tpu] done: {printable}")
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
