"""Show ground-truth vs top-k retrieved reports for validation videos.

Reference counterpart: scripts/show_prediction_examples.py — human-readable
GT-vs-prediction examples from a finished contrastive run's retrieval
artifacts (the per-video retrieval CSV + unique-texts CSV that
VideoContrastiveLearningRunner.validate writes into ``<run>/val/``).

Usage:
    python scripts/show_prediction_examples.py --run_dir <run> \
        [--epoch N] [--num 5] [--only misses]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _latest_epoch(val_dir: Path) -> int:
    epochs = sorted(
        int(p.stem.rsplit("_", 1)[-1])
        for p in val_dir.glob("retrieval_results_epoch_*.csv")
    )
    if not epochs:
        raise SystemExit(f"no retrieval_results_epoch_*.csv under {val_dir}")
    return epochs[-1]


def _clip(text: str, width: int = 90) -> str:
    text = str(text)
    return text if len(text) <= width else text[: width - 3] + "..."


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--num", type=int, default=5)
    ap.add_argument("--only", choices=["all", "hits", "misses"], default="all")
    args = ap.parse_args(argv)

    val_dir = Path(args.run_dir) / args.split
    epoch = args.epoch if args.epoch is not None else _latest_epoch(val_dir)
    df = pd.read_csv(val_dir / f"retrieval_results_epoch_{epoch}.csv")

    topk_cols = sorted(
        (c for c in df.columns if c.startswith("top") and c.endswith("_text")),
        key=lambda c: int("".join(ch for ch in c if ch.isdigit()) or 0),
    )
    shown = 0
    for i, row in df.iterrows():
        gt = str(row.get("gt_text", row.get("text", "")))
        preds = [str(row[c]) for c in topk_cols if pd.notna(row.get(c))]
        hit_rank = next(
            (r + 1 for r, p in enumerate(preds) if p == gt), None
        )
        if args.only == "hits" and hit_rank is None:
            continue
        if args.only == "misses" and hit_rank is not None:
            continue
        shown += 1
        print("=" * 100)
        print(f"EXAMPLE {shown} (epoch {epoch})")
        print(f"Video: {row.get('path', row.get('FileName', f'row {i}'))}")
        print("-" * 100)
        print("GROUND TRUTH:")
        print(f"  {_clip(gt)}")
        print(f"PREDICTIONS (top-{len(preds)}, "
              f"{'HIT @' + str(hit_rank) if hit_rank else 'MISS'}):")
        for r, p in enumerate(preds, 1):
            marker = "->" if p == gt else "  "
            print(f"  {marker} {r}. {_clip(p)}")
        if shown >= args.num:
            break
    if not shown:
        print("no matching examples")


if __name__ == "__main__":
    main()
