"""Merge contrast/injection flat files with report CSVs by accession.

Behavioral port of reference scripts/merge_contrast_with_reports.py (402
LoC): auto-detected delimiters, pipe-delimited multi-value expansion,
accession normalization, per-accession injection summaries (count, total
volume ml), left-merged onto the report table.

Usage:
    python scripts/merge_contrast_with_reports.py \
        --contrast contrast.csv --reports reports.csv --out merged.csv
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VALUE_DELIMITER = "|"
_ACCESSION_CANDIDATES = ("accession", "accessionnumber", "accession_number",
                         "acc_num")


def detect_delimiter(path: str | Path, fallback: str = ",") -> str:
    """Sniff the column delimiter from the header line (reference :48)."""
    first = Path(path).open(encoding="utf-8", errors="replace").readline()
    counts = {d: first.count(d) for d in (",", "\t", ";", "α")}
    best = max(counts, key=counts.get)
    return best if counts[best] > 0 else fallback


def read_flat_file(path: str | Path) -> pd.DataFrame:
    return pd.read_csv(path, sep=detect_delimiter(path), engine="python")


def expand_pipe_delimited_values(
    df: pd.DataFrame, value_delimiter: str = VALUE_DELIMITER
) -> pd.DataFrame:
    """Explode rows whose object cells pack multiple values as 'a|b|c'
    (reference :87): every packed column is split and rows are expanded
    positionally (ragged lists pad with None)."""
    packed = [
        c for c in df.columns
        if pd.api.types.is_string_dtype(df[c]) or df[c].dtype == object
    ]
    packed = [
        c for c in packed
        if df[c].astype(str).str.contains(re.escape(value_delimiter)).any()
    ]
    if not packed:
        return df.reset_index(drop=True)
    rows = []
    for _, row in df.iterrows():
        splits = {
            c: [v.strip() for v in str(row[c]).split(value_delimiter)]
            if pd.notna(row[c]) else [None]
            for c in packed
        }
        n = max(len(v) for v in splits.values())
        for i in range(n):
            new = row.to_dict()
            for c in packed:
                vals = splits[c]
                new[c] = vals[i] if i < len(vals) else None
            rows.append(new)
    return pd.DataFrame(rows).reset_index(drop=True)


def normalize_accession(series: pd.Series) -> pd.Series:
    """Uppercase, strip separators/whitespace, drop leading zeros
    (reference :141)."""
    s = series.astype(str).str.upper().str.replace(r"[\s\-_]", "", regex=True)
    return s.str.lstrip("0").replace("", "0")


def locate_accession_column(columns: Sequence[str]) -> Optional[str]:
    lowered = {c.lower().replace(" ", ""): c for c in columns}
    for cand in _ACCESSION_CANDIDATES:
        if cand in lowered:
            return lowered[cand]
    return None


def _extract_volume_ml(value: object) -> Optional[float]:
    """'12 ml', '8.5ML', 'vol: 10' -> float ml (reference :198)."""
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return None
    m = re.search(r"(\d+(?:\.\d+)?)", str(value))
    return float(m.group(1)) if m else None


def summarize_injection_data(
    df: pd.DataFrame, accession_col: Optional[str] = None
) -> pd.DataFrame:
    """Per-accession injection summary (reference :152): n_injections,
    total/mean contrast volume, distinct agents."""
    accession_col = accession_col or locate_accession_column(df.columns)
    if accession_col is None:
        raise ValueError("no accession column found")
    work = df.copy()
    work["__acc"] = normalize_accession(work[accession_col])
    vol_col = next(
        (c for c in work.columns if "volume" in c.lower()
         or c.lower() in ("vol", "contrast_ml")), None)
    agent_col = next(
        (c for c in work.columns if "agent" in c.lower()
         or "contrast_name" in c.lower()), None)
    rows = []
    for acc, g in work.groupby("__acc", sort=True):
        row = {"accession": acc, "n_injections": int(len(g))}
        if vol_col:
            vols = [_extract_volume_ml(v) for v in g[vol_col]]
            vols = [v for v in vols if v is not None]
            row["total_volume_ml"] = float(sum(vols)) if vols else np.nan
            row["mean_volume_ml"] = float(np.mean(vols)) if vols else np.nan
        if agent_col:
            agents = sorted({str(a) for a in g[agent_col].dropna()})
            row["contrast_agents"] = ";".join(agents)
        rows.append(row)
    return pd.DataFrame(rows)


def merge_contrast_with_reports(
    contrast_path: str | Path,
    reports_path: str | Path,
    out_path: Optional[str | Path] = None,
) -> pd.DataFrame:
    contrast = expand_pipe_delimited_values(read_flat_file(contrast_path))
    summary = summarize_injection_data(contrast)

    from deepcoro_clip_tpu.data.csv_utils import read_csv_with_fallback

    reports = read_csv_with_fallback(str(reports_path))
    acc_col = locate_accession_column(reports.columns)
    if acc_col is None:
        raise ValueError("reports file has no accession column")
    reports = reports.copy()
    reports["__acc"] = normalize_accession(reports[acc_col])
    merged = reports.merge(
        summary.rename(columns={"accession": "__acc"}), on="__acc", how="left"
    ).drop(columns="__acc")
    if out_path:
        merged.to_csv(out_path, index=False)
    return merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contrast", required=True)
    ap.add_argument("--reports", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    merged = merge_contrast_with_reports(args.contrast, args.reports, args.out)
    print(f"merged {len(merged)} rows -> {args.out}")


if __name__ == "__main__":
    main()
