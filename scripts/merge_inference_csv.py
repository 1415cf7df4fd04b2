"""Merge inference-split CSVs, primary-first union by exam.

Generalized equivalent of the reference's one-off merger
(reference: scripts/merge_inference_csv.py — hardcoded two site runs):
all inference rows of the PRIMARY csv are kept; each later csv
contributes only the exams (StudyInstanceUID) not yet present. Columns
are the union; missing ones fill with NaN (plain concat semantics).

Usage:
  python scripts/merge_inference_csv.py primary.csv extra1.csv ... -o merged.csv
      [--key StudyInstanceUID] [--split inference]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def merge_inference_csvs(paths, key="StudyInstanceUID", split="inference"):
    import pandas as pd

    from deepcoro_clip_tpu.data.csv_utils import read_csv_with_fallback

    frames = []
    seen: set = set()
    for i, p in enumerate(paths):
        df = read_csv_with_fallback(p)
        if split and "Split" in df.columns:
            df = df[df["Split"] == split].copy()
        if key not in df.columns:
            raise ValueError(f"{p}: missing merge key column {key!r}")
        if i > 0:
            df = df[~df[key].isin(seen)].copy()
        seen.update(df[key].unique())
        print(f"{p}: +{len(df)} rows ({df[key].nunique()} new exams)")
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csvs", nargs="+", help="primary csv first, then extras")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--key", default="StudyInstanceUID")
    ap.add_argument("--split", default="inference",
                    help="Split filter ('' disables)")
    args = ap.parse_args(argv)
    merged = merge_inference_csvs(args.csvs, key=args.key,
                                  split=args.split or None)
    merged.to_csv(args.output, sep="α", index=False)
    print(f"saved {len(merged)} rows ({merged[args.key].nunique()} exams) "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
