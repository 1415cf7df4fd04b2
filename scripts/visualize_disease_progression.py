"""Visualize disease progression: embedding change vs vessels worsened.

Reference counterpart: visualize_disease_progression.py — panels over the
pre/post-study change-score table (scripts/compute_study_change_scores.py):
embedding-space change grouped by the number of vessels with new/worsened
disease, plus the correlation between the two.

Input CSV columns: the change-score output (``cosine_distance`` / ``l2``)
joined with per-pair clinical deltas (``vessels_new_disease`` and/or
``vessels_worsened``, optional ``group``).

Usage:
    python scripts/visualize_disease_progression.py \
        --scores scores.csv --out progression.png \
        [--change-col cosine_distance]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--scores", required=True)
    ap.add_argument("--change-col", default="cosine_distance")
    ap.add_argument("--out", default="disease_progression.png")
    args = ap.parse_args(argv)

    df = pd.read_csv(args.scores)
    change = args.change_col
    if change not in df.columns:
        raise SystemExit(f"column {change!r} not in {list(df.columns)}")
    group_cols = [c for c in ("vessels_new_disease", "vessels_worsened")
                  if c in df.columns]
    if not group_cols:
        raise SystemExit(
            "need vessels_new_disease and/or vessels_worsened columns")

    n = len(group_cols)
    fig, axes = plt.subplots(n, 2, figsize=(11, 4.5 * n), squeeze=False)
    for r, gcol in enumerate(group_cols):
        sub = df[[gcol, change]].dropna()
        grouped = sub.groupby(gcol)[change].agg(["mean", "std", "count"])
        ax = axes[r][0]
        ax.bar(grouped.index.astype(float), grouped["mean"],
               yerr=grouped["std"].fillna(0.0), capsize=4, alpha=0.8)
        for x, (m, c) in zip(grouped.index,
                             zip(grouped["mean"], grouped["count"])):
            ax.annotate(f"n={int(c)}", (float(x), m), ha="center",
                        xytext=(0, 4), textcoords="offset points",
                        fontsize=8)
        ax.set_xlabel(gcol)
        ax.set_ylabel(f"mean {change}")
        ax.grid(alpha=0.3)

        ax = axes[r][1]
        x = sub[gcol].astype(float).to_numpy()
        y = sub[change].to_numpy()
        ax.scatter(x + np.random.default_rng(0).uniform(
            -0.08, 0.08, len(x)), y, s=14, alpha=0.6)
        if len(sub) > 2 and np.std(x) > 0:
            rho = float(np.corrcoef(x, y)[0, 1])
            # least-squares trend
            a, b = np.polyfit(x, y, 1)
            xs = np.linspace(x.min(), x.max(), 20)
            ax.plot(xs, a * xs + b, "r--", lw=1,
                    label=f"pearson r = {rho:.3f}")
            ax.legend(fontsize=8)
        ax.set_xlabel(gcol)
        ax.set_ylabel(change)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    plt.close(fig)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
