"""Per-subgroup metric analysis over prediction CSVs.

Reference counterpart: scripts/sub_group_analysis.py (601 LoC) — computes the
per-head metrics within subgroups (sex, age bins, vessel, site...) from a
predictions CSV joined with metadata.

Usage:
    python scripts/sub_group_analysis.py --predictions preds.csv \
        --metadata meta.csv --join_on study_id --group_by sex \
        --head stenosis --task regression [--n_bootstrap 200]
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import pandas as pd

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepcoro_clip_tpu.utils.metrics import compute_head_metrics  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--metadata", default=None)
    ap.add_argument("--join_on", default="study_id")
    ap.add_argument("--group_by", required=True)
    ap.add_argument("--head", required=True)
    ap.add_argument("--task", default="binary",
                    choices=["binary", "regression", "multiclass"])
    ap.add_argument("--n_bootstrap", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    df = pd.read_csv(args.predictions)
    if args.metadata:
        meta = pd.read_csv(args.metadata)
        df = df.merge(meta, on=args.join_on, how="inner")

    pred_col = f"{args.head}_pred"
    tgt_col = f"{args.head}_target"
    results = {}
    for group, sub in df.groupby(args.group_by):
        if len(sub) < 3:
            continue
        m = compute_head_metrics(
            sub[pred_col].to_numpy(), sub[tgt_col].to_numpy(), args.task,
            with_ci=args.n_bootstrap > 0, n_bootstrap=args.n_bootstrap,
        )
        m["n"] = int(len(sub))
        results[str(group)] = m
    text = json.dumps(results, indent=2, default=float)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
