"""Hyperparameter sweep driver: random / grid / bayes (TPE) search with
optional hyperband-style successive-halving early termination.

Reference counterpart: scripts/run_sweep.sh + sweep_runner.sh launching W&B
sweeps with ``method: bayes`` and hyperband early termination
(reference: config/clip/sweep_siglip_output_dataset_config.yaml:1-8).
Zero-dependency version: the Bayes method is a Tree-structured Parzen
Estimator (split observations at a quantile, model good/bad densities,
maximize their ratio — the same family W&B/hyperopt use), and hyperband runs
successive-halving rungs by training each surviving trial for more epochs
and RESUMING it from its own pinned run directory.

Sweep YAML:
    base_config: config/clip/base_config.yaml
    metric: val/loss          # optimized metric from metrics.jsonl
    mode: min
    trials: 10
    method: bayes             # random | grid | bayes
    early_terminate:          # optional (any method)
      type: hyperband
      min_iter: 1             # epochs in the first rung
      eta: 3                  # keep top 1/eta per rung
      max_iter: 9             # total-epoch cap
    parameters:
      lr: {min: 1e-5, max: 1e-3, log: true}
      dropout: {min: 0.05, max: 0.3}
      optimizer: {values: [AdamW, lion]}

Usage: python scripts/run_sweep.py sweep.yaml [--trials N]
"""

from __future__ import annotations

import argparse
import itertools
import json
import math
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# --------------------------------------------------------------------- #
# parameter sampling
# --------------------------------------------------------------------- #


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


def _param_to_unit(value, dist) -> Optional[float]:
    """Map a continuous param into [0, 1] (None for categorical)."""
    if "values" in dist:
        return None
    lo, hi = float(dist["min"]), float(dist["max"])
    if dist.get("log"):
        lo, hi = math.log(lo), math.log(hi)
        value = math.log(max(float(value), 1e-300))
    return (float(value) - lo) / max(hi - lo, 1e-12)


def _unit_to_param(u: float, dist) -> float:
    lo, hi = float(dist["min"]), float(dist["max"])
    if dist.get("log"):
        lo, hi = math.log(lo), math.log(hi)
        return float(math.exp(lo + u * (hi - lo)))
    return float(lo + u * (hi - lo))


def tpe_suggest(
    observations: List[dict],
    spec: dict,
    rng: np.random.Generator,
    mode: str = "min",
    gamma: float = 0.25,
    n_candidates: int = 64,
    n_init: int = 4,
) -> dict:
    """Tree-structured Parzen Estimator suggestion.

    Observations: [{"params": {...}, "score": float}]. Below ``n_init``
    observations (or with no scores) falls back to random sampling.
    Continuous params use Gaussian kernels around good/bad points in unit
    space; categoricals use add-one-smoothed counts. The candidate
    maximizing the good/bad density ratio wins.
    """
    scored = [o for o in observations if o.get("score") is not None]
    if len(scored) < n_init:
        return sample_params(spec, rng)
    scores = np.asarray([o["score"] for o in scored], np.float64)
    if mode == "max":
        scores = -scores
    n_good = max(1, int(np.ceil(gamma * len(scored))))
    order = np.argsort(scores)
    good = [scored[i] for i in order[:n_good]]
    bad = [scored[i] for i in order[n_good:]] or good

    def density(value, name, dist, group):
        vals = [g["params"][name] for g in group if name in g["params"]]
        if not vals:
            return 1.0
        if "values" in dist:
            counts = {v: 1.0 for v in dist["values"]}  # add-one smoothing
            for v in vals:
                counts[v] = counts.get(v, 1.0) + 1.0
            total = sum(counts.values())
            return counts.get(value, 1.0) / total
        u = _param_to_unit(value, dist)
        us = np.asarray([_param_to_unit(v, dist) for v in vals])
        bw = max(0.1, 1.0 / max(len(us), 1))
        return float(
            np.mean(np.exp(-0.5 * ((u - us) / bw) ** 2)) / (bw * 2.5066) + 1e-12
        )

    best, best_ratio = None, -np.inf
    for _ in range(n_candidates):
        # sample candidates from the GOOD distribution (TPE's l(x))
        cand = {}
        for name, dist in spec.items():
            g_vals = [g["params"][name] for g in good if name in g["params"]]
            if "values" in dist:
                if g_vals and rng.random() < 0.8:
                    cand[name] = g_vals[int(rng.integers(len(g_vals)))]
                else:
                    cand[name] = dist["values"][
                        int(rng.integers(len(dist["values"])))]
            elif g_vals and rng.random() < 0.8:
                center = _param_to_unit(
                    g_vals[int(rng.integers(len(g_vals)))], dist)
                u = float(np.clip(rng.normal(center, 0.15), 0.0, 1.0))
                cand[name] = _unit_to_param(u, dist)
            else:
                cand[name] = sample_params({name: dist}, rng)[name]
        ratio = 1.0
        for name, dist in spec.items():
            ratio *= density(cand[name], name, dist, good) / max(
                density(cand[name], name, dist, bad), 1e-12)
        if ratio > best_ratio:
            best, best_ratio = cand, ratio
    return best


# --------------------------------------------------------------------- #
# trial execution (pinned run dirs so hyperband rungs can resume)
# --------------------------------------------------------------------- #


def run_trial(
    base_config: str,
    params: dict,
    run_dir: Path,
    metric: str,
    mode: str,
    epochs: Optional[int] = None,
    resume: bool = False,
) -> Optional[float]:
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import RunnerRegistry, register_all
    from deepcoro_clip_tpu.utils.plot_metrics import load_history

    register_all()
    overrides = []
    for k, v in params.items():
        overrides += [f"--{k}", str(v)]
    if epochs is not None:
        overrides += ["--epochs", str(epochs)]
    if resume:
        overrides += ["--resume_training", "true"]
    config = parse_config(["--base_config", base_config] + overrides)
    run_dir.mkdir(parents=True, exist_ok=True)
    runner = RunnerRegistry.get(config.pipeline_project)(
        config, output_dir=str(run_dir))
    start = runner.maybe_resume() if hasattr(runner, "maybe_resume") else 0
    runner.train(start_epoch=start)
    runner.logger.finish()

    key = metric.replace("/", "_")
    hist = [h for h in load_history(run_dir)
            if metric in h or key in h or f"val/{key}" in h]
    vals = [h.get(metric, h.get(key, h.get(f"val/{key}"))) for h in hist]
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    return float(min(vals) if mode == "min" else max(vals))


def successive_halving(
    base_config: str,
    population: List[dict],
    out_root: Path,
    metric: str,
    mode: str,
    min_iter: int = 1,
    eta: int = 3,
    max_iter: Optional[int] = None,
) -> List[dict]:
    """Hyperband-style early termination: rung k trains every surviving
    trial to ``min_iter * eta^k`` total epochs (resuming from its own run
    dir) and keeps the top 1/eta."""
    alive = [{"trial": i, "params": p, "score": None}
             for i, p in enumerate(population)]
    budget = min_iter
    rung = 0
    while alive:
        print(f"[sweep] hyperband rung {rung}: {len(alive)} trials "
              f"-> {budget} total epochs", flush=True)
        for t in alive:
            run_dir = out_root / f"trial_{t['trial']:03d}"
            try:
                t["score"] = run_trial(
                    base_config, t["params"], run_dir, metric, mode,
                    epochs=budget, resume=rung > 0,
                )
            except Exception as e:  # noqa: BLE001 - trial isolation
                print(f"[sweep] trial {t['trial']} failed: {e}")
                t["score"] = None
        alive = [t for t in alive if t["score"] is not None]
        alive.sort(key=lambda t: t["score"], reverse=(mode == "max"))
        if len(alive) <= 1 or (max_iter and budget >= max_iter):
            break
        alive = alive[: max(1, int(np.ceil(len(alive) / eta)))]
        budget = budget * eta if max_iter is None else min(budget * eta,
                                                           max_iter)
        rung += 1
    return alive


# --------------------------------------------------------------------- #


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep_config")
    ap.add_argument("--trials", type=int, default=None)
    ap.add_argument("--out", default="outputs/sweeps")
    args = ap.parse_args()

    spec = yaml.safe_load(open(args.sweep_config))
    metric = spec.get("metric", "val/loss")
    mode = spec.get("mode", "min")
    n_trials = args.trials or spec.get("trials", 10)
    method = spec.get("method", "random")
    rng = np.random.default_rng(spec.get("seed", 0))
    out_root = Path(args.out)
    early = spec.get("early_terminate") or {}

    if early.get("type") == "hyperband":
        if method == "grid":
            population = list(itertools.islice(
                grid_params(spec["parameters"]), n_trials))
        else:  # random or bayes: hyperband populations are sampled up front
            population = [sample_params(spec["parameters"], rng)
                          for _ in range(n_trials)]
        survivors = successive_halving(
            spec["base_config"], population, out_root, metric, mode,
            min_iter=int(early.get("min_iter", 1)),
            eta=int(early.get("eta", 3)),
            max_iter=early.get("max_iter"),
        )
        results = survivors
    else:
        results = []
        for i in range(n_trials):
            if method == "grid":
                try:
                    params = next(itertools.islice(
                        grid_params(spec["parameters"]), i, i + 1))
                except StopIteration:
                    break
            elif method == "bayes":
                params = tpe_suggest(results, spec["parameters"], rng, mode)
            else:
                params = sample_params(spec["parameters"], rng)
            print(f"[sweep] trial {i}: {params}", flush=True)
            try:
                score = run_trial(
                    spec["base_config"], params,
                    out_root / f"trial_{i:03d}", metric, mode,
                )
            except Exception as e:  # noqa: BLE001 - trial isolation
                print(f"[sweep] trial {i} failed: {e}")
                score = None
            results.append({"trial": i, "params": params, "score": score})
            print(f"[sweep] trial {i}: {metric}={score}", flush=True)
        results = [r for r in results if r["score"] is not None]
        results.sort(key=lambda r: r["score"], reverse=(mode == "max"))

    summary = {"best": results[0] if results else None, "all": results}
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "sweep_results.json").write_text(
        json.dumps(summary, indent=2, default=float))
    print(json.dumps(summary, indent=2, default=float))


if __name__ == "__main__":
    main()
