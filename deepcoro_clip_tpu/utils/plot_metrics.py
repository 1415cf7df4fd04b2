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
