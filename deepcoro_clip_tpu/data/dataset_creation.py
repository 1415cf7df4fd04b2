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


# ------------------------------------------------------------------ #
# report generation from structured per-vessel predictions (the in-scope
# core of reference dataset_creation/generate_dataset.py:133-544)
# ------------------------------------------------------------------ #

# display names keyed by the structured-prediction stenosis columns
# (reference LABELS_TO_VESSEL_NAMES, generate_dataset.py:50-69)
VESSEL_DISPLAY: Dict[str, str] = {
    "left_main_stenosis": "the Left Main Coronary Artery (LMCA)",
    "prox_lad_stenosis": "the proximal LAD",
    "mid_lad_stenosis": "the mid LAD",
    "dist_lad_stenosis": "the distal LAD",
    "D1_stenosis": "D1 branch",
    "D2_stenosis": "D2 branch",
    "lcx_stenosis": "the proximal LCX",
    "dist_lcx_stenosis": "the distal LCX",
    "om1_stenosis": "OM1",
    "om2_stenosis": "OM2",
    "prox_rca_stenosis": "the proximal RCA",
    "mid_rca_stenosis": "the mid RCA",
    "dist_rca_stenosis": "the distal RCA",
    "pda_stenosis": "the PDA",
    "posterolateral_stenosis": "the posterolateral branch",
    "bx_stenosis": "Ramus",
    "lvp_stenosis": "left posterolateral branch",
    "lima_or_svg_stenosis": "the LIMA or SVG graft",
}

_REPORT_RCA = ["prox_rca_stenosis", "mid_rca_stenosis", "dist_rca_stenosis"]
_REPORT_NON_RCA = [
    "left_main_stenosis", "prox_lad_stenosis", "mid_lad_stenosis",
    "dist_lad_stenosis", "D1_stenosis", "D2_stenosis", "lcx_stenosis",
    "dist_lcx_stenosis", "om1_stenosis", "om2_stenosis", "bx_stenosis",
    "lvp_stenosis",
]
_REPORT_RIGHT_DEPENDENT = ["pda_stenosis", "posterolateral_stenosis"]


def format_stenosis_value(p: float) -> str:
    """Percent -> severity phrase (reference generate_dataset.py:133-144)."""
    if p == 0:
        return "no significant stenosis"
    for bound, name in ((50, "mild"), (70, "moderate"), (90, "severe")):
        if p < bound:
            return f"{name} stenosis (~{p}%)"
    return f"critical stenosis (~{p}%)"


def format_calcification_value(c: str) -> str:
    """Calcification free text -> standardized phrase (reference :146-158;
    accepts the source tables' French labels)."""
    txt = str(c).lower()
    if "no calcification" in txt or "pas de calcification" in txt:
        return "no calcifications"
    for keys, label in ((("minimes", "mild"), "minimal"),
                        (("modérées", "moderate"), "moderate"),
                        (("importantes", "severe"), "severe")):
        if any(k in txt for k in keys):
            return f"{label} calcifications"
    return f"calcifications present ({c})"


def format_ifr_value(v: float) -> str:
    """reference :160-163 (0.89 is the clinical IFR cut)."""
    return f"IFR {'normal' if v > 0.89 else 'abnormal'} (~{v:.2f})"


def _present(value) -> bool:
    if value is None:
        return False
    if isinstance(value, float) and np.isnan(value):
        return False
    return value not in (0, 0.0, "", "0", "0.0", "nan", -1, "-1")


def create_report(row, coronary_specific_report: bool = True) -> str:
    """Structured per-vessel predictions -> textual angiography report
    (reference create_report, generate_dataset.py:349-544): dominance-aware
    vessel ordering, CTO / in-stent restenosis / stenosis phrasing, calcif +
    IFR + bifurcation descriptors, collateral circulation, closing dominance
    sentence."""
    get = row.get if hasattr(row, "get") else lambda k, d=None: d

    dom_raw = str(get("dominance_name", "") or "").replace("_", " ")
    dom_lower = dom_raw.lower()
    # anatomy overrides the label: a diseased LVP only exists in
    # left-dominant (or co-dominant) hearts
    try:
        lvp_val = float(get("lvp_stenosis", 0) or 0)
    except (TypeError, ValueError):
        lvp_val = 0.0
    if lvp_val > 0:
        dom_raw = dom_lower = "left dominant"

    if "right" in dom_lower:
        rca_order = _REPORT_RCA + _REPORT_RIGHT_DEPENDENT
        non_rca_order = [v for v in _REPORT_NON_RCA if v != "lvp_stenosis"]
    else:  # left- or co-dominant: LVP is the posterior vessel, PDA absent
        rca_order = list(_REPORT_RCA)
        non_rca_order = list(_REPORT_NON_RCA)

    if coronary_specific_report:
        side = get("main_structure_name")
        if side == "Right Coronary":
            order = rca_order
        elif side == "Left Coronary":
            order = non_rca_order
        else:
            return "Invalid main_structure_name for coronary-specific report"
    else:
        order = list(VESSEL_DISPLAY)

    display = dict(VESSEL_DISPLAY)
    if "left" in dom_lower:
        display["pda_stenosis"] = "the LEFT PDA"
        display["posterolateral_stenosis"] = "the LEFT posterolateral branch"

    has_graft = ("pontage" in str(get("Conclusion", "")).lower()
                 or get("bypass_graft", 0) == 1)
    if not has_graft and "lima_or_svg_stenosis" in order:
        order = [v for v in order if v != "lima_or_svg_stenosis"]

    lines: List[str] = []
    for label in order:
        prefix = label[: -len("_stenosis")]
        desc: List[str] = []
        if _present(get(prefix + "_cto", 0)) and float(get(prefix + "_cto", 0)) == 1:
            desc.append("is 100% blocked and is a CTO")
        else:
            st = get(label, -1)
            if st is not None and not (
                isinstance(st, float) and np.isnan(st)
            ) and st != -1:
                stent = get(prefix + "_stent", 0)
                if _present(stent) and float(stent) > 0:
                    if float(st) <= 10:
                        desc.append("no restenosis in stent")
                    else:
                        desc.append(
                            "in-stent restenosis "
                            f"({format_stenosis_value(float(st))})"
                        )
                else:
                    desc.append(format_stenosis_value(float(st)))
        calc = get(prefix + "_calcif", "-1")
        if isinstance(calc, str) and calc.strip() != "-1":
            desc.append(format_calcification_value(calc))
        ifr = get(prefix + "_IFRHYPEREMIE", -1)
        if ifr is not None and not (
            isinstance(ifr, float) and np.isnan(ifr)
        ) and ifr != -1:
            desc.append(format_ifr_value(float(ifr)))
        bif = get(prefix + "_bifurcation")
        if _present(bif):
            text = str(bif).strip()
            if text.lower() != "pas de lésion de bifurcation":
                desc.append(f"bifurcation lesion (Medina {text})")
        if desc:
            joined = (desc[0] if len(desc) == 1
                      else ", ".join(desc[:-1]) + ", and " + desc[-1])
            lines.append(f"{display[label]} has {joined}.")

    # collateral circulation: receivers in scope, then in-scope donors
    all_labels = list(VESSEL_DISPLAY)
    for label in order:
        coll = get(label[: -len("_stenosis")] + "_collateral")
        if _present(coll):
            if isinstance(coll, str) and coll.strip().lower() != "nan":
                lines.append(f"{VESSEL_DISPLAY[label]} receives collaterals "
                             f"from the {coll.strip()}.")
            elif isinstance(coll, (int, float)):
                lines.append(f"{VESSEL_DISPLAY[label]} receives collateral "
                             f"circulation (code: {coll}).")
    for label in order:
        mine = VESSEL_DISPLAY[label].lower()
        variants = {mine, mine.replace("the ", "")}
        for tok in ("rca", "lad", "lcx"):
            if tok in mine:
                variants.add(tok)
        for other in all_labels:
            coll = get(other[: -len("_stenosis")] + "_collateral")
            if _present(coll) and isinstance(coll, str):
                donor = coll.strip().lower()
                if any(v and v in donor for v in variants):
                    lines.append(f"{VESSEL_DISPLAY[label]} gives collaterals "
                                 f"to {VESSEL_DISPLAY[other]}.")

    if dom_raw.strip():
        lines.append(f"The coronary circulation is {dom_raw}.")
    return ("\n".join(lines) if lines
            else "No significant findings or additional data available.")


def generate_reports(df, coronary_specific: bool = True):
    """Add a ``Report`` column from the structured columns (reference
    generate_reports, generate_dataset.py:723-744)."""
    out = df.copy()
    out["Report"] = [
        create_report(row, coronary_specific_report=coronary_specific)
        for _, row in out.iterrows()
    ]
    return out


# --------------------------------------------------------------------------- #
# procedure-status cascade + temporal ordering (reference
# dataset_creation/generate_dataset.py:540-880, scripts/regenerate_dataset.py)
# --------------------------------------------------------------------------- #

# clinical class-id tables (the behavior IS the spec)
MAIN_STRUCTURE_NAMES: Dict[int, str] = {
    0: "Left Coronary", 1: "Right Coronary", 2: "Other", 3: "Graft",
    4: "Catheter", 5: "Femoral", 6: "LV", 7: "TAVR", 8: "Aorta",
    9: "Radial", 10: "TEE probe", 11: "Pigtail",
}
DOMINANCE_NAMES: Dict[int, str] = {0: "right_dominant", 1: "left_dominant"}

# ground-truth per-segment PCI-performed flags, grouped by coronary side
PCIDONE_COLUMNS: Dict[str, List[str]] = {
    "left": ["left_main_pcidone", "prox_lad_pcidone", "mid_lad_pcidone",
             "dist_lad_pcidone", "D1_pcidone", "D2_pcidone",
             "prox_lcx_pcidone", "mid_lcx_pcidone", "dist_lcx_pcidone",
             "om1_pcidone", "om2_pcidone", "bx_pcidone", "lvp_pcidone"],
    "right": ["prox_rca_pcidone", "mid_rca_pcidone", "dist_rca_pcidone",
              "pda_pcidone", "posterolateral_pcidone",
              "right_marginal_pcidone"],
}

_ACQ_TIME_RE = None  # compiled lazily


def acquisition_time_from_filename(filename) -> Optional[float]:
    """DICOM acquisition datetime (14-digit YYYYMMDDHHMMSS) embedded in the
    SOP-UID part of ``StudyUID_SOPInstanceUID.*`` filenames, as a float so
    procedures spanning midnight still order correctly. None when absent.
    (Reference: generate_dataset.py:791-812 — series_time can carry corrupted
    transfer timestamps, so the filename is the primary source.)"""
    import re

    global _ACQ_TIME_RE
    if _ACQ_TIME_RE is None:
        _ACQ_TIME_RE = re.compile(r"(20[12]\d[01]\d[0-3]\d\d{6})")
    base = str(filename).rsplit("/", 1)[-1]
    if "_" not in base:
        return None
    m = _ACQ_TIME_RE.search(base.split("_", 1)[1])
    return float(m.group(1)) if m else None


def sort_by_acquisition_time(df: "pd.DataFrame") -> "pd.DataFrame":
    """Stable per-study temporal sort: filename acquisition time first,
    series_time/SeriesTime fallback (positive values only for series_time —
    -1 means missing), unknown times last."""
    if "StudyInstanceUID" not in df.columns:
        return df
    if "FileName" in df.columns:
        primary = df["FileName"].map(acquisition_time_from_filename)
    else:
        primary = pd.Series(np.nan, index=df.index)
    if "series_time" in df.columns:
        fb = pd.to_numeric(df["series_time"], errors="coerce")
        fb = fb.where(fb > 0)
    elif "SeriesTime" in df.columns:
        fb = pd.to_numeric(df["SeriesTime"], errors="coerce")
    else:
        fb = pd.Series(np.nan, index=df.index)
    key = primary.astype(float).fillna(fb)
    order = (
        pd.DataFrame({"_study": df["StudyInstanceUID"], "_t": key})
        .sort_values(["_study", "_t"], na_position="last", kind="stable")
        .index
    )
    return df.loc[order]


def pci_confirmed_on_side(df: "pd.DataFrame") -> "pd.Series":
    """True where the GT *_pcidone columns confirm a PCI on the video's
    labelled coronary side. Non-LCA/RCA rows (Femoral, Catheter, ...) and
    frames with no pcidone columns at all default to True — legacy behavior:
    trust the stent classifier there (those rows are filtered before
    inference anyway)."""
    sides = {}
    for side, cols in PCIDONE_COLUMNS.items():
        have = [c for c in cols if c in df.columns]
        if have:
            vals = df[have].apply(pd.to_numeric, errors="coerce").fillna(0)
            sides[side] = (vals > 0).any(axis=1)
        else:
            sides[side] = pd.Series(False, index=df.index)
    if not any((c in df.columns) for cols in PCIDONE_COLUMNS.values()
               for c in cols):
        return pd.Series(True, index=df.index)
    is_left = df["main_structure_name"].eq("Left Coronary")
    is_right = df["main_structure_name"].eq("Right Coronary")
    return ((is_left & sides["left"]) | (is_right & sides["right"])
            | (~is_left & ~is_right))


def assign_procedure_status(df: "pd.DataFrame") -> "pd.DataFrame":
    """Three mutually exclusive statuses per video (expects the frame already
    in temporal order — see sort_by_acquisition_time):

    - ``PCI``: stent_presence_class == 1 — always, even when the structure
      classifier mislabelled the side;
    - ``POST_PCI``: a later contrast video of a study+side whose earlier PCI
      is CONFIRMED by the GT pcidone flags (unconfirmed stent=1 videos do
      not contaminate their neighbours — they stay out of the cascade);
    - ``diagnostic``: everything before any confirmed PCI on that side.
    """
    out = df.copy()
    stent = out["stent_presence_class"].eq(1)
    cascade = stent & pci_confirmed_on_side(out)
    seen_before = (
        cascade.groupby(
            [out["StudyInstanceUID"], out["main_structure_name"]], sort=False
        ).transform(lambda g: g.cumsum().shift(fill_value=0)).astype(bool)
    )
    status = pd.Series("unknown", index=out.index)
    status[~stent & ~seen_before] = "diagnostic"
    contrast = (out["contrast_agent_class"].eq(1)
                if "contrast_agent_class" in out.columns
                else pd.Series(True, index=out.index))
    status[~stent & seen_before & contrast] = "POST_PCI"
    status[stent] = "PCI"
    out["status"] = status
    return out


def inference_filter_mask(df: "pd.DataFrame") -> "pd.Series":
    """Rows eligible for retrieval inference: diagnostic contrast videos of
    the left/right coronary tree, excluding congenital procedures and
    studies whose every *_stenosis value is -1/NaN (no coronary GT)."""
    congenital = (
        df["series_description"].str.contains("CONGENITAL", case=False,
                                              na=False)
        if "series_description" in df.columns
        else pd.Series(False, index=df.index)
    )
    stenosis_cols = [c for c in df.columns if c.endswith("_stenosis")]
    if stenosis_cols:
        vals = df[stenosis_cols].apply(pd.to_numeric, errors="coerce")
        no_data = ((vals == -1) | vals.isna()).all(axis=1)
    else:
        no_data = pd.Series(False, index=df.index)
    contrast = (df["contrast_agent_class"].eq(1)
                if "contrast_agent_class" in df.columns
                else pd.Series(True, index=df.index))
    return (
        df["status"].eq("diagnostic")
        & df["main_structure_name"].isin(["Left Coronary", "Right Coronary"])
        & contrast & ~congenital & ~no_data
    )


def regenerate_dataset(df: "pd.DataFrame",
                       coronary_specific: bool = True) -> "pd.DataFrame":
    """Full regeneration pipeline (reference scripts/regenerate_dataset.py):
    class-id maps -> temporal sort -> status cascade -> inference filter ->
    test->inference split rename -> report generation. Returns the
    inference-ready frame; the caller owns IO."""
    out = df.copy()
    if "main_structure_class" in out.columns:
        out["main_structure_name"] = out["main_structure_class"].map(
            MAIN_STRUCTURE_NAMES)
    if "dominance_class" in out.columns:
        out["dominance_name"] = out["dominance_class"].map(DOMINANCE_NAMES)
    out = sort_by_acquisition_time(out)
    out = assign_procedure_status(out)
    diag = out.loc[inference_filter_mask(out)].copy()
    if "Split" in diag.columns:
        diag["Split"] = diag["Split"].replace({"test": "inference"})
    diag["Report"] = [
        create_report(row, coronary_specific_report=coronary_specific)
        for _, row in diag.iterrows()
    ]
    return diag
