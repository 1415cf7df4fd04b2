"""Map between FileName patterns and StudyInstanceUIDs in prediction CSVs.

Reference counterpart: utils/study_id_mapper.py:1-126 — a debugging aid for
tracing one acquisition (a DICOM FileName fragment) through the per-video
prediction CSV to its study UID(s), then confirming those studies landed in
the study-level metrics table. Library functions return structured dicts;
the CLI prints a readable trace.

Usage:
  python scripts/study_id_mapper.py PATTERN predictions.csv [study_metrics.csv]
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional, Sequence

import pandas as pd


def find_study_by_filename_pattern(
    pattern: str, predictions_csv_path: str
) -> Optional[Dict[str, Any]]:
    """All StudyInstanceUIDs whose rows' FileName contains ``pattern``,
    with a per-study breakdown (reference :9-70)."""
    df = pd.read_csv(predictions_csv_path)
    if "FileName" not in df.columns:
        raise ValueError(f"{predictions_csv_path} has no FileName column")
    rows = df[df["FileName"].astype(str).str.contains(pattern, na=False,
                                                      regex=False)]
    if rows.empty:
        return None
    uids = rows["StudyInstanceUID"].unique().tolist()
    breakdown: Dict[str, Any] = {}
    for uid in uids:
        sub = rows[rows["StudyInstanceUID"] == uid]
        entry: Dict[str, Any] = {
            "prediction_count": int(len(sub)),
            "sample_filenames": sub["FileName"].head(2).tolist(),
        }
        for col, key in (("main_structure_name", "structures"),
                         ("ground_truth_idx", "ground_truth_indices")):
            if col in sub.columns:
                entry[key] = sub[col].unique().tolist()
        breakdown[uid] = entry
    return {
        "search_pattern": pattern,
        "unique_study_uids": uids,
        "total_predictions": int(len(rows)),
        "study_breakdown": breakdown,
    }


def check_study_in_final_metrics(
    study_uids: Sequence[str], study_metrics_csv_path: str
) -> Dict[str, Optional[Dict[str, Any]]]:
    """Which of ``study_uids`` appear in the study-level metrics CSV; the
    found ones carry their metric row (reference :72-97)."""
    df = pd.read_csv(study_metrics_csv_path)
    out: Dict[str, Optional[Dict[str, Any]]] = {}
    for uid in study_uids:
        sub = df[df["StudyInstanceUID"] == uid]
        out[uid] = None if sub.empty else sub.iloc[0].to_dict()
    return out


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pattern", help="FileName substring to trace")
    ap.add_argument("predictions_csv")
    ap.add_argument("study_metrics_csv", nargs="?")
    args = ap.parse_args(argv)

    mapping = find_study_by_filename_pattern(args.pattern,
                                             args.predictions_csv)
    if mapping is None:
        print(f"no FileName contains {args.pattern!r}")
        return 1
    print(f"pattern: {mapping['search_pattern']}")
    print(f"matching predictions: {mapping['total_predictions']}")
    print(f"unique studies: {len(mapping['unique_study_uids'])}")
    for uid, b in mapping["study_breakdown"].items():
        print(f"  {uid}: {b['prediction_count']} predictions; "
              f"e.g. {b['sample_filenames'][:1]}")
    if args.study_metrics_csv:
        found = check_study_in_final_metrics(
            mapping["unique_study_uids"], args.study_metrics_csv)
        for uid, row in found.items():
            if row is None:
                print(f"  NOT in study metrics: {uid}")
            else:
                keys = [k for k in ("prediction_count", "dominance_name",
                                    "has_both_structures") if k in row]
                print(f"  in study metrics: {uid} "
                      + " ".join(f"{k}={row[k]}" for k in keys))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
