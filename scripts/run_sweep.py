"""Hyperparameter sweep driver (random / grid search).

Reference counterpart: scripts/run_sweep.sh + sweep_runner.sh + W&B Bayes
sweeps (reference: config/clip/sweep_config_*.yaml). Zero-dependency version:
a sweep YAML declares parameter distributions; each trial runs the normal
pipeline in-process with CLI-style overrides and reads its result from the
run's metrics history.

Sweep YAML:
    base_config: config/clip/base_config.yaml
    metric: val/loss          # optimized metric from metrics.jsonl
    mode: min
    trials: 10
    method: random            # random | grid
    parameters:
      lr: {values: [1e-4, 3e-4]}          # grid-style choices
      dropout: {min: 0.05, max: 0.3}      # uniform
      temperature: {min: 0.03, max: 0.1, log: true}

Usage: python scripts/run_sweep.py sweep.yaml [--trials N]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def sample_params(spec: dict, rng: np.random.Generator) -> dict:
    out = {}
    for name, dist in spec.items():
        if "values" in dist:
            out[name] = dist["values"][int(rng.integers(len(dist["values"])))]
        elif dist.get("log"):
            lo, hi = np.log(dist["min"]), np.log(dist["max"])
            out[name] = float(np.exp(rng.uniform(lo, hi)))
        else:
            out[name] = float(rng.uniform(dist["min"], dist["max"]))
    return out


def grid_params(spec: dict):
    keys = list(spec)
    value_lists = [spec[k].get("values", [spec[k].get("min")]) for k in keys]
    for combo in itertools.product(*value_lists):
        yield dict(zip(keys, combo))


def trial_result(result: dict, run_dir, metric: str, mode: str):
    from deepcoro_clip_tpu.utils.plot_metrics import load_history

    hist = [h for h in load_history(run_dir) if metric in h]
    if not hist:
        return None
    vals = [h[metric] for h in hist]
    return min(vals) if mode == "min" else max(vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep_config")
    ap.add_argument("--trials", type=int, default=None)
    args = ap.parse_args()

    spec = yaml.safe_load(open(args.sweep_config))
    metric = spec.get("metric", "val/loss")
    mode = spec.get("mode", "min")
    n_trials = args.trials or spec.get("trials", 10)
    rng = np.random.default_rng(spec.get("seed", 0))

    from deepcoro_clip_tpu.main import main as run_main
    from deepcoro_clip_tpu.utils.files import generate_run_id

    if spec.get("method", "random") == "grid":
        candidates = itertools.islice(grid_params(spec["parameters"]), n_trials)
    else:
        candidates = (sample_params(spec["parameters"], rng)
                      for _ in range(n_trials))

    results = []
    for i, params in enumerate(candidates):
        overrides = []
        for k, v in params.items():
            overrides += [f"--{k}", str(v)]
        run_name = f"sweep_{generate_run_id()}"
        overrides += ["--name", run_name]
        print(f"[sweep] trial {i}: {params}")
        try:
            out = run_main(["--base_config", spec["base_config"]] + overrides)
        except Exception as e:
            print(f"[sweep] trial {i} failed: {e}")
            continue
        score = None
        if isinstance(out, dict) and "best_val_loss" in out and metric == "val/loss":
            score = out["best_val_loss"]
        results.append({"trial": i, "params": params, "score": score})
        print(f"[sweep] trial {i}: {metric}={score}")

    results = [r for r in results if r["score"] is not None]
    results.sort(key=lambda r: r["score"], reverse=(mode == "max"))
    print(json.dumps({"best": results[0] if results else None,
                      "all": results}, indent=2, default=float))


if __name__ == "__main__":
    main()
