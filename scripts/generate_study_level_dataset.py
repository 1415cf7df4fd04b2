"""Group a per-video manifest into a study-level dataset.

Reference counterpart: scripts/generate_study_level_dataset.py (381 LoC) +
scripts/merge_contrast_with_reports.py — groups clips by StudyInstanceUID,
attaches one report per study, and filters by per-video quality flags.

Usage:
    python scripts/generate_study_level_dataset.py --input videos.csv \
        --reports reports.csv --out study_level.csv \
        [--min_videos 1] [--max_videos 10] [--contrast_column contrast_agent]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="per-video CSV")
    ap.add_argument("--reports", default=None,
                    help="CSV with StudyInstanceUID + Report")
    ap.add_argument("--out", required=True)
    ap.add_argument("--groupby", default="StudyInstanceUID")
    ap.add_argument("--report_column", default="Report")
    ap.add_argument("--min_videos", type=int, default=1)
    ap.add_argument("--max_videos", type=int, default=0,
                    help="0 = keep all; else keep first N per study")
    ap.add_argument("--contrast_column", default=None,
                    help="keep only rows where this column is truthy")
    args = ap.parse_args()

    sep = "α" if "α" in Path(args.input).read_text()[:2048] else ","
    df = pd.read_csv(args.input, sep=sep, engine="python" if sep == "α" else "c")
    if args.contrast_column and args.contrast_column in df.columns:
        before = len(df)
        df = df[df[args.contrast_column].astype(bool)]
        print(f"contrast filter: kept {len(df)}/{before} videos")

    if args.reports:
        rep = pd.read_csv(args.reports)
        rep = rep[[args.groupby, args.report_column]].drop_duplicates(
            args.groupby
        )
        df = df.drop(columns=[args.report_column], errors="ignore").merge(
            rep, on=args.groupby, how="left"
        )

    sizes = df.groupby(args.groupby).size()
    keep = sizes[sizes >= args.min_videos].index
    df = df[df[args.groupby].isin(keep)]
    if args.max_videos > 0:
        df = df.groupby(args.groupby, group_keys=False).head(args.max_videos)

    df.to_csv(args.out, sep="α", index=False)
    print(f"wrote {len(df)} videos across {df[args.groupby].nunique()} studies "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
