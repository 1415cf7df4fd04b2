"""Warm-compile a quality-run train-step program with ONE executed step.

Compiles go through the REMOTE compile service (~35 min cold for a fresh
flagship program) while the chip itself is only touched for state init +
a single step (~seconds) — so this can run CONCURRENTLY with a long
training run to hide a recipe variant's compile latency: the later real
run then hits the persistent compile cache (utils/compile_cache).

The program is selected by the same env knobs dev/quality_run.py reads
(DEEPCORO_QR_STUDY / _MONO / _LR / _WARMUP / _SEED / _REUSE_STATS ...);
the runner, batch path and step call are the real ones, so the cached
executable is exactly what the chunked trainer will request.

Usage: DEEPCORO_QR_...=... python dev/warm_train_step.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "quality_run_knobs", REPO / "dev" / "quality_run.py")
    qr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qr)

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import RunnerRegistry, register_all
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    register_all()
    cfg_path = qr.RUN_DIR / "train_config.yaml"
    if not cfg_path.exists():
        qr._write_train_config()
    config = parse_config(["--base_config", str(cfg_path)])
    out = qr.RUN_DIR / "warm"
    out.mkdir(parents=True, exist_ok=True)
    runner = RunnerRegistry.get(config.pipeline_project)(
        config, output_dir=str(out))

    import jax
    import numpy as np

    loader = runner.loaders["train"]
    loader.set_epoch(0)
    batch = next(iter(loader))
    db = runner.bundle.batch_sharding_fn(
        {k: v for k, v in batch.items() if isinstance(v, np.ndarray)})
    t0 = time.perf_counter()
    state, metrics = runner.train_step(
        runner.state, db, jax.random.PRNGKey(0), 0.0, 0.0, -1.0)
    jax.block_until_ready(metrics["loss"])
    print(f"warm step done in {time.perf_counter() - t0:.1f} s "
          f"(loss {float(metrics['loss']):.4f}) — program cached for "
          f"{qr.RUN_DIR.name}", flush=True)


if __name__ == "__main__":
    main()
