"""Offline dataset creation: structured predictions -> canonical SigLIP
prompts, texts/edges manifests, and synthetic reports.

Reference counterpart: dataset_creation/generate_dataset.py (1105 LoC) +
docs/siglip_multi_positive.md:36-56 — builds the ``texts.csv`` / ``edges.csv``
/ ``videos.csv`` manifest triplet from per-segment stenosis annotations, with
canonical severity normalisation and prompt dedup.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from deepcoro_clip_tpu.utils.stenosis_extractor import percent_to_severity

# segment -> (coronary tree, human-readable name)
SEGMENT_INFO: Dict[str, Tuple[str, str]] = {
    "left_main": ("left", "left main"),
    "prox_lad": ("left", "proximal LAD"),
    "mid_lad": ("left", "mid LAD"),
    "dist_lad": ("left", "distal LAD"),
    "d1": ("left", "first diagonal"),
    "d2": ("left", "second diagonal"),
    "prox_lcx": ("left", "proximal circumflex"),
    "dist_lcx": ("left", "distal circumflex"),
    "om1": ("left", "first obtuse marginal"),
    "om2": ("left", "second obtuse marginal"),
    "ramus": ("left", "ramus intermedius"),
    "prox_rca": ("right", "proximal RCA"),
    "mid_rca": ("right", "mid RCA"),
    "dist_rca": ("right", "distal RCA"),
    "pda": ("right", "posterior descending artery"),
    "posterolateral": ("right", "posterolateral branch"),
}


def canonical_prompt(segment: str, severity: str, percent: Optional[float] = None,
                     cto: bool = False) -> str:
    """Canonical SigLIP prompt text for one finding (dedup-able: identical
    findings always produce identical strings)."""
    _, name = SEGMENT_INFO.get(segment, ("", segment.replace("_", " ")))
    if cto:
        return f"chronic total occlusion of the {name}"
    if severity == "normal":
        return f"the {name} is normal"
    if percent is not None:
        bucket = int(round(percent / 10.0) * 10)
        return f"{severity} stenosis of the {name} ({bucket}%)"
    return f"{severity} stenosis of the {name}"


def build_siglip_manifests(
    df: pd.DataFrame,
    out_dir: str | Path,
    video_id_column: str = "video_id",
    filename_column: str = "FileName",
    segment_columns: Optional[Dict[str, str]] = None,
    cto_columns: Optional[Dict[str, str]] = None,
    split_column: str = "Split",
) -> Dict[str, Path]:
    """df: one row per video with per-segment stenosis-percent columns.

    segment_columns: {segment: column} (default: '<segment>_stenosis' columns
    present in df). Writes texts.csv / edges.csv / videos.csv.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if segment_columns is None:
        segment_columns = {
            seg: f"{seg}_stenosis"
            for seg in SEGMENT_INFO
            if f"{seg}_stenosis" in df.columns
        }
    cto_columns = cto_columns or {}

    text_ids: Dict[str, str] = {}
    texts_rows: List[dict] = []
    edges_rows: List[dict] = []

    def text_id_for(segment: str, severity: str, prompt: str) -> str:
        if prompt not in text_ids:
            tid = f"t{len(text_ids):06d}"
            text_ids[prompt] = tid
            tree, _ = SEGMENT_INFO.get(segment, ("", ""))
            texts_rows.append(
                {"text_id": tid, "text": prompt, "tree": tree,
                 "segment": segment, "disease_severity": severity}
            )
        return text_ids[prompt]

    for _, row in df.iterrows():
        vid = str(row[video_id_column]) if video_id_column in row else str(
            row[filename_column]
        )
        for seg, col in segment_columns.items():
            val = row.get(col)
            if val is None or (isinstance(val, float) and np.isnan(val)):
                continue
            pct = float(val)
            cto = bool(row.get(cto_columns.get(seg, ""), False))
            severity = "cto" if cto else percent_to_severity(pct)
            prompt = canonical_prompt(seg, severity, pct, cto)
            tid = text_id_for(seg, severity, prompt)
            # edge weight grows with finding severity percent
            weight = 1.0 + pct / 100.0
            edges_rows.append({"video_id": vid, "text_id": tid, "weight": weight})

    texts_path = out_dir / "texts.csv"
    edges_path = out_dir / "edges.csv"
    videos_path = out_dir / "videos.csv"
    pd.DataFrame(texts_rows).to_csv(texts_path, index=False)
    pd.DataFrame(edges_rows).to_csv(edges_path, index=False)

    vids = df[[c for c in (filename_column, video_id_column, split_column,
                           "StudyInstanceUID") if c in df.columns]].copy()
    vids.to_csv(videos_path, index=False)
    return {"texts": texts_path, "edges": edges_path, "videos": videos_path}


def reconstruct_report(findings: List[Tuple[str, str, Optional[float], bool]]) -> str:
    """Join per-segment findings into a synthetic report (reference report
    reconstruction, dataloaders/siglip_support.py:815-900)."""
    parts = [canonical_prompt(seg, sev, pct, cto)
             for seg, sev, pct, cto in findings]
    return ". ".join(parts) + "." if parts else "normal coronary arteries."
