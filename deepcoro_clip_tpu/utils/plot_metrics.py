"""Plotting suite: training curves, retrieval panels, confusion matrices.

Reference counterpart: utils/plot_metrics.py (2422 LoC of matplotlib panels)
— distilled to the panels the runners actually produce, reading the run dir's
``metrics.jsonl`` history (utils/logging_utils.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_history(run_dir: str | Path) -> List[Dict]:
    path = Path(run_dir) / "metrics.jsonl"
    if not path.exists():
        return []
    return [json.loads(l) for l in path.read_text().splitlines() if l.strip()]


def plot_training_curves(
    run_dir: str | Path,
    keys: Sequence[str] = ("train/loss", "val/loss"),
    out: Optional[str | Path] = None,
):
    hist = load_history(run_dir)
    fig, ax = plt.subplots(figsize=(7, 4))
    for key in keys:
        pts = [(h.get("step", i), h[key]) for i, h in enumerate(hist) if key in h]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, marker="o", label=key)
    ax.set_xlabel("epoch")
    ax.set_ylabel("value")
    ax.legend()
    ax.grid(alpha=0.3)
    out = out or Path(run_dir) / "training_curves.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_retrieval_metrics(run_dir: str | Path, out: Optional[str | Path] = None):
    hist = load_history(run_dir)
    keys = sorted(
        {k for h in hist for k in h if k.startswith("val/Recall@") or k == "val/MRR"}
    )
    return plot_training_curves(run_dir, keys, out or Path(run_dir) / "retrieval.png")


def plot_confusion_matrix(
    confusion: Dict[str, int], title: str = "", out: str | Path = "confusion.png"
):
    mat = np.array(
        [[confusion["tn"], confusion["fp"]], [confusion["fn"], confusion["tp"]]]
    )
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(mat, cmap="Blues")
    for i in range(2):
        for j in range(2):
            ax.text(j, i, str(mat[i, j]), ha="center", va="center")
    ax.set_xticks([0, 1], ["pred 0", "pred 1"])
    ax.set_yticks([0, 1], ["true 0", "true 1"])
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_prediction_scatter(
    preds: np.ndarray, targets: np.ndarray, head: str = "",
    out: str | Path = "scatter.png",
):
    fig, ax = plt.subplots(figsize=(4.5, 4.5))
    ax.scatter(targets, preds, s=12, alpha=0.6)
    lo = float(min(np.min(targets), np.min(preds)))
    hi = float(max(np.max(targets), np.max(preds)))
    ax.plot([lo, hi], [lo, hi], "k--", lw=1)
    ax.set_xlabel(f"{head} target")
    ax.set_ylabel(f"{head} prediction")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_epoch_metrics_line_charts(
    trajectory, out: str | Path = "epoch_metrics.png",
    metric_suffix: str = "mae",
):
    """Per-vessel metric trajectories across validation epochs (reference
    plot_epoch_metrics_line_charts in utils/plot_metrics.py), fed by
    data/study_analysis.run_multi_epoch_analysis output (a DataFrame or CSV
    path with an ``epoch`` column and ``<vessel>/<metric>`` columns)."""
    import pandas as pd

    df = pd.read_csv(trajectory) if isinstance(trajectory, (str, Path)) \
        else trajectory
    cols = [c for c in df.columns if c.endswith(f"/{metric_suffix}")]
    if not cols:
        return None
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for c in cols:
        ax.plot(df["epoch"], df[c], marker="o",
                label=c.rsplit("/", 1)[0].replace("_stenosis", ""))
    ax.set_xlabel("epoch")
    ax.set_ylabel(metric_suffix)
    ax.legend(fontsize=7, ncols=2)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_grad_norms(run_dir: str | Path, out: Optional[str | Path] = None):
    """Per-module gradient-norm curves from the step metrics (reference
    log_gradient_norms, utils/wandb_logger.py:491-510)."""
    hist = load_history(run_dir)
    keys = sorted({k for h in hist for k in h
                   if "grad_norm" in k})
    if not keys:
        return None
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for key in keys:
        pts = [(h.get("step", i), h[key]) for i, h in enumerate(hist)
               if key in h and isinstance(h[key], (int, float))]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, label=key.split("/")[-1], alpha=0.8)
    ax.set_xlabel("step")
    ax.set_ylabel("grad norm")
    ax.set_yscale("log")
    ax.legend(fontsize=7, ncols=2)
    ax.grid(alpha=0.3)
    out = out or Path(run_dir) / "grad_norms.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_run_summary(run_dir: str | Path) -> List[Path]:
    """Every applicable panel for a run dir in one call (the role of the
    reference's 2,422-LoC plot_metrics suite entry points)."""
    outs = []
    for fn in (plot_training_curves, plot_retrieval_metrics, plot_grad_norms):
        try:
            p = fn(run_dir)
            if p is not None:
                outs.append(p)
        except Exception:
            continue
    return outs
