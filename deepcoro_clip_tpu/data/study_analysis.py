"""Study-level aggregation & multi-epoch validation analysis.

Behavioral port of the reference's offline analysis mass
(reference: utils/data_aggregation.py — dominance-aware vessel selection
:145-172, study aggregation :174-285, per-vessel metrics :862-;
utils/clean_study_analysis.py — multi-epoch study-level predictions,
calcification mode-with-fallback :255-280). Vectorized pandas, no torch.

Capabilities:
- ``get_vessels_for_dominance``: pda/posterolateral belong to the RCA
  territory under right dominance, lvp to the left under left dominance.
- ``aggregate_study_level_data``: one row per study — stenosis means, IFR
  means excluding sentinel values, calcification modes, numeric means /
  categorical modes for everything else.
- ``compute_study_metrics``: per-vessel MAE/correlation and >=70%
  ("significant stenosis") AUROC, plus the study-level max-stenosis
  composite the paper's headline AUROC is built on.
- ``run_multi_epoch_analysis``: sweep a run directory's per-epoch
  prediction CSVs, aggregate each to study level against ground truth, and
  tabulate metric trajectories.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd

RCA_VESSELS = ["prox_rca_stenosis", "mid_rca_stenosis", "dist_rca_stenosis"]
NON_RCA_VESSELS = [
    "left_main_stenosis", "prox_lad_stenosis", "mid_lad_stenosis",
    "dist_lad_stenosis", "prox_lcx_stenosis", "dist_lcx_stenosis",
]
RIGHT_DOMINANCE_DEPENDENT_VESSELS = ["pda_stenosis", "posterolateral_stenosis"]
LEFT_DOMINANCE_DEPENDENT_VESSELS = ["lvp_stenosis"]
DEFAULT_VESSEL_LABELS = (
    RCA_VESSELS + NON_RCA_VESSELS
    + RIGHT_DOMINANCE_DEPENDENT_VESSELS + LEFT_DOMINANCE_DEPENDENT_VESSELS
    + ["d1_stenosis", "d2_stenosis", "om1_stenosis", "om2_stenosis",
       "ramus_stenosis"]
)
SIGNIFICANT_STENOSIS_THRESHOLD = 70.0  # the clinical line (reference README)


def _dominance_side(dominance: Union[str, int, float, None]) -> str:
    """Normalize a dominance label to 'right' or 'left'.

    Behavior matches the reference (utils/data_aggregation.py:145-172):
    numeric encodings mean 0 = right and anything else = left; names count
    as right only when they contain "right" (so "co-dominant" falls on the
    left/extended-LCX side); missing values default to right dominant (the
    common anatomy)."""
    if dominance is None:
        return "right"
    try:
        as_num = float(str(dominance))
    except (TypeError, ValueError):
        return "right" if "right" in str(dominance).lower() else "left"
    if np.isnan(as_num):
        return "right"
    return "right" if as_num == 0 else "left"


def get_vessels_for_dominance(
    dominance: Union[str, int, float, None],
) -> Tuple[List[str], List[str]]:
    """(rca_vessels, non_rca_vessels) for a study's coronary dominance:
    the PDA/posterolateral territory belongs to the RCA in right-dominant
    anatomy, while the LVP joins the circumflex side in left-dominant."""
    if _dominance_side(dominance) == "right":
        return (RCA_VESSELS + RIGHT_DOMINANCE_DEPENDENT_VESSELS,
                list(NON_RCA_VESSELS))
    return (list(RCA_VESSELS),
            NON_RCA_VESSELS + LEFT_DOMINANCE_DEPENDENT_VESSELS)


def _mode(values: Sequence) -> Optional[object]:
    vals = [v for v in values if v is not None and not (
        isinstance(v, float) and np.isnan(v))]
    if not vals:
        return None
    return max(set(vals), key=vals.count)


def calcification_mode_with_fallback(values: Sequence) -> Optional[object]:
    """Mode of calcification labels; on a tie the MOST SEVERE wins
    (reference clean_study_analysis.py:255-280)."""
    vals = [v for v in values if v is not None and not (
        isinstance(v, float) and np.isnan(v))]
    if not vals:
        return None
    counts: Dict[object, int] = {}
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    best = max(counts.values())
    tied = [v for v, c in counts.items() if c == best]
    if len(tied) == 1:
        return tied[0]
    order = {"none": 0, "mild": 1, "moderate": 2, "severe": 3}

    def severity_of(v):
        s = str(v).lower()
        for name, rank in sorted(order.items(), key=lambda kv: -kv[1]):
            if name in s:
                return rank
        try:
            return float(v)
        except (TypeError, ValueError):
            return -1

    return max(tied, key=severity_of)


def aggregate_study_level_data(
    df: pd.DataFrame,
    study_col: str = "StudyInstanceUID",
    dominance_col: str = "dominance_name",
    vessel_labels: Optional[Sequence[str]] = None,
) -> pd.DataFrame:
    """One row per study (reference: utils/data_aggregation.py:174-285):
    stenosis columns averaged, *_IFRHYPER averaged excluding sentinel values
    (<= 0.01), *_calcif by mode-with-severity-fallback, other numerics by
    mean and other objects by mode."""
    if study_col not in df.columns:
        return df
    for cand in (dominance_col, "dominance_class", "coronary_dominance"):
        if cand in df.columns:
            dominance_col = cand
            break
    vessel_labels = [v for v in (vessel_labels or DEFAULT_VESSEL_LABELS)
                     if v in df.columns]
    prefixes = [v.replace("_stenosis", "") for v in vessel_labels]
    vessel_related = {
        c for c in df.columns
        for p in prefixes
        if c.startswith(p) and c.endswith(("_stenosis", "_IFRHYPER", "_calcif"))
    }
    meta = {study_col, dominance_col}
    other = [c for c in df.columns if c not in vessel_related and c not in meta]

    rows = []
    for sid, g in df.groupby(study_col, sort=True):
        row: Dict[str, object] = {study_col: sid}
        if dominance_col in g.columns:
            dom = g[dominance_col].dropna()
            row[dominance_col] = dom.iloc[0] if len(dom) else None
        for v in vessel_labels:
            row[v] = float(g[v].mean()) if g[v].notna().any() else np.nan
            ifr = v.replace("_stenosis", "_IFRHYPER")
            if ifr in g.columns:
                valid = g[ifr].dropna()
                valid = valid[valid > 0.01]  # exclude 0/-1 sentinels
                row[ifr] = float(valid.mean()) if len(valid) else np.nan
            calcif = v.replace("_stenosis", "_calcif")
            if calcif in g.columns:
                row[calcif] = calcification_mode_with_fallback(
                    g[calcif].tolist())
        for c in other:
            col = g[c]
            if pd.api.types.is_numeric_dtype(col):
                row[c] = float(col.mean()) if col.notna().any() else np.nan
            else:
                row[c] = _mode(col.tolist())
        rows.append(row)
    return pd.DataFrame(rows)


def _auroc(y: np.ndarray, p: np.ndarray) -> float:
    from deepcoro_clip_tpu.utils.metrics import _roc_auc

    return float(_roc_auc(np.asarray(p, float), np.asarray(y, int)))


def compute_study_metrics(
    agg_pred: pd.DataFrame,
    agg_gt: pd.DataFrame,
    study_col: str = "StudyInstanceUID",
    vessel_labels: Optional[Sequence[str]] = None,
    threshold: float = SIGNIFICANT_STENOSIS_THRESHOLD,
) -> Dict[str, Dict[str, float]]:
    """Per-vessel MAE / Pearson correlation / >=threshold AUROC over
    study-aggregated predictions vs ground truth, plus the study-level
    max-stenosis composite AUROC (reference: data_aggregation.py:862-,
    README 'significant stenosis detection')."""
    merged = agg_pred.merge(agg_gt, on=study_col, suffixes=("_pred", "_gt"))
    vessel_labels = vessel_labels or DEFAULT_VESSEL_LABELS
    out: Dict[str, Dict[str, float]] = {"stenosis": {}, "per_vessel": {}}
    pred_max = np.full(len(merged), -np.inf)
    gt_max = np.full(len(merged), -np.inf)
    any_vessel = False
    for v in vessel_labels:
        pcol, gcol = f"{v}_pred", f"{v}_gt"
        if pcol not in merged.columns or gcol not in merged.columns:
            continue
        mask = merged[pcol].notna() & merged[gcol].notna()
        if mask.sum() < 2:
            continue
        p = merged.loc[mask, pcol].to_numpy(float)
        g = merged.loc[mask, gcol].to_numpy(float)
        entry = {
            "n": int(mask.sum()),
            "mae": float(np.mean(np.abs(p - g))),
        }
        if np.std(p) > 1e-9 and np.std(g) > 1e-9:
            entry["corr"] = float(np.corrcoef(p, g)[0, 1])
        yb = (g >= threshold).astype(int)
        if 0 < yb.sum() < len(yb):
            entry[f"auroc@{threshold:g}"] = _auroc(yb, p)
        out["per_vessel"][v] = entry
        full_p = merged[pcol].to_numpy(float)
        full_g = merged[gcol].to_numpy(float)
        pred_max = np.fmax(pred_max, np.nan_to_num(full_p, nan=-np.inf))
        gt_max = np.fmax(gt_max, np.nan_to_num(full_g, nan=-np.inf))
        any_vessel = True
    if any_vessel:
        valid = np.isfinite(pred_max) & np.isfinite(gt_max)
        if valid.sum() >= 2:
            yb = (gt_max[valid] >= threshold).astype(int)
            study = {"n": int(valid.sum())}
            if 0 < yb.sum() < len(yb):
                study[f"auroc@{threshold:g}"] = _auroc(yb, pred_max[valid])
            study["mae_max_stenosis"] = float(
                np.mean(np.abs(pred_max[valid] - gt_max[valid])))
            out["stenosis"]["study_max"] = study
    return out


def find_epoch_prediction_files(run_dir: str | Path,
                                pattern: str = "predictions*epoch*.csv"
                                ) -> List[Tuple[int, Path]]:
    """(epoch, path) pairs for per-epoch prediction CSVs under a run dir
    (reference clean_study_analysis.find_validation_epoch_files:91)."""
    out = []
    for p in Path(run_dir).rglob(pattern):
        m = re.search(r"epoch[_-]?(\d+)", p.name)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def run_multi_epoch_analysis(
    run_dir: str | Path,
    ground_truth_csv: str | Path,
    study_col: str = "StudyInstanceUID",
    vessel_labels: Optional[Sequence[str]] = None,
    pattern: str = "predictions*epoch*.csv",
    out_csv: Optional[str | Path] = None,
) -> pd.DataFrame:
    """Tabulate study-level metric trajectories across validation epochs
    (reference: clean_study_analysis.run_multi_epoch_analysis:948,
    data_aggregation.run_multi_epoch_analysis_optimized:2350)."""
    from deepcoro_clip_tpu.data.csv_utils import read_csv_with_fallback

    gt = read_csv_with_fallback(str(ground_truth_csv))
    agg_gt = aggregate_study_level_data(gt, study_col=study_col,
                                        vessel_labels=vessel_labels)
    rows = []
    for epoch, path in find_epoch_prediction_files(run_dir, pattern):
        pred = pd.read_csv(path)
        agg_pred = aggregate_study_level_data(pred, study_col=study_col,
                                              vessel_labels=vessel_labels)
        metrics = compute_study_metrics(agg_pred, agg_gt,
                                        study_col=study_col,
                                        vessel_labels=vessel_labels)
        row: Dict[str, object] = {"epoch": epoch}
        for v, m in metrics["per_vessel"].items():
            for k, val in m.items():
                row[f"{v}/{k}"] = val
        for k, val in metrics["stenosis"].get("study_max", {}).items():
            row[f"study_max/{k}"] = val
        rows.append(row)
    df = pd.DataFrame(rows)
    if out_csv:
        df.to_csv(out_csv, index=False)
    return df
