"""Reversible-with-mapping dataset anonymization.

Reference counterpart: utils/anonyme_dataset_coro.py:158-520 — hash PHI
columns in place with per-column-type prefixes, keep a detailed tracking
mapping (anonymized value -> original) in a secured JSON, year-only birth
dates, recovery helpers, and an integrity verifier. The tracking file is
the sensitive artifact: it inverts the anonymization and must live outside
the released dataset.

TPU-repo adaptation: hashing is optionally SALTED (the reference uses bare
md5 — vulnerable to dictionary inversion of structured ids; pass salt=None
for byte-compatible behavior with the reference's scheme, a secret salt for
release-grade ids).
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

# reference high_priority_anonymize (:169-178): anonymized IN PLACE, never
# dropped — downstream joins keep working through the hashed ids
HIGH_PRIORITY_ANONYMIZE = [
    "CathReport_MRN", "Patient_ID", "IDPATIENT", "PatientName",
    "PatientBirthDate", "PatientBirthTime",
    "InstitutionName", "InstitutionAddress", "StationName",
    "DeviceSerialNumber", "HOSPITAL", "SALLE", "NSEJOUR",
    "DICOMPath", "FileName", "StudyInstanceUID", "SeriesInstanceUID",
    "SOPInstanceUID", "StudyID", "NameOfPhysiciansReadingStudy",
    "PerformingPhysicianName", "OperatorsName",
]

_UID_COLS = {"StudyInstanceUID", "SeriesInstanceUID", "SOPInstanceUID"}
_PATIENT_COLS = {"Patient_ID", "IDPATIENT"}


def _digest(value: Any, salt: Optional[str]) -> str:
    s = str(value)
    if salt is None:
        return hashlib.md5(s.encode()).hexdigest()[:16]
    return hashlib.sha256((salt + s).encode()).hexdigest()[:16]


def anonymize_value(value: Any, column_name: str,
                    salt: Optional[str] = None) -> Optional[str]:
    """Column-typed anonymized token (reference :229-258 prefix scheme):
    UID columns -> '<Kind>_<hash16>', patient ids -> 'PATIENT_', MRN ->
    'MRN_', names -> 'NAME_', institutions -> 'HOSP_', birth dates keep the
    YEAR only; everything else '<COLUMN>_<hash16>'."""
    if pd.isna(value) or str(value).strip() == "":
        return None
    if column_name in _UID_COLS:
        return f"{column_name.split('_')[0]}_{_digest(value, salt)}"
    if column_name in _PATIENT_COLS:
        return f"PATIENT_{_digest(value, salt)}"
    if column_name == "CathReport_MRN":
        return f"MRN_{_digest(value, salt)}"
    if column_name == "PatientName":
        return f"NAME_{_digest(value, salt)}"
    if column_name in {"InstitutionName", "HOSPITAL"}:
        return f"HOSP_{_digest(value, salt)}"
    if column_name == "PatientBirthDate":
        try:
            return f"YEAR_{pd.to_datetime(value).year}"
        except Exception:
            return f"DATE_{_digest(value, salt)}"
    return f"{column_name.upper()}_{_digest(value, salt)}"


def anonymize_with_tracking(
    df_original: pd.DataFrame,
    columns: Optional[List[str]] = None,
    salt: Optional[str] = None,
) -> Tuple[pd.DataFrame, Dict[str, Any]]:
    """Anonymize ``columns`` (default: the reference's high-priority PHI
    list) in place and return (df_anon, mapping). The mapping records, per
    column, every anonymized->original value pair plus study/patient
    cross-indices (reference :158-343)."""
    columns = [c for c in (columns or HIGH_PRIORITY_ANONYMIZE)
               if c in df_original.columns]
    df_anon = df_original.copy()
    log: Dict[str, Any] = {
        "created_date": datetime.now().isoformat(),
        "total_records": int(len(df_original)),
        "total_columns_original": int(len(df_original.columns)),
        "salted": salt is not None,
        "columns_anonymized": [],
        "columns_kept": [],
        "value_mappings": {},
        "study_mappings": {},
        "patient_mappings": {},
        "column_anonymization_details": {},
    }
    for col in df_original.columns:
        if col not in columns:
            log["columns_kept"].append({"column_name": col})
            continue
        log["columns_anonymized"].append({
            "column_name": col, "action": "anonymized",
            "reason": "high_priority_identifier",
        })
        detail = {
            "action": "anonymized",
            "reason": "high_priority_identifier",
            "original_data_type": str(df_original[col].dtype),
            "original_unique_values": int(df_original[col].nunique()),
            "value_mappings": {},
        }
        value_map: Dict[Any, Optional[str]] = {}
        for value in df_original[col].dropna().unique():
            anon = anonymize_value(value, col, salt)
            if anon is None:
                continue
            value_map[value] = anon
            detail["value_mappings"][anon] = str(value)
            log["value_mappings"][f"{col}_{anon}"] = str(value)
            if col == "StudyInstanceUID":
                log["study_mappings"][anon] = {
                    "original_study_uid": str(value)}
            if col in _PATIENT_COLS:
                log["patient_mappings"][anon] = {
                    "original_patient_id": str(value)}
        log["column_anonymization_details"][col] = detail
        df_anon[col] = df_original[col].map(
            lambda v, m=value_map: m.get(v, v) if pd.notna(v) else v)
    return df_anon, log


def recover_original_value(anonymized_value: str, column_name: str,
                           mapping: Dict[str, Any]) -> Optional[str]:
    """Invert one token via the tracking mapping (reference :401-412)."""
    detail = mapping.get("column_anonymization_details", {}).get(column_name)
    if detail:
        hit = detail.get("value_mappings", {}).get(anonymized_value)
        if hit is not None:
            return hit
    return mapping.get("value_mappings", {}).get(
        f"{column_name}_{anonymized_value}")


def recover_original_info(anonymized_study_id: str,
                          mapping: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """Study-level inversion (reference :414-433)."""
    return mapping.get("study_mappings", {}).get(anonymized_study_id)


def verify_anonymization_integrity(
    df_original: pd.DataFrame,
    df_anonymized: pd.DataFrame,
    mapping: Dict[str, Any],
) -> Dict[str, Any]:
    """Structural integrity report (reference :435-488): anonymized columns
    all present, unique-value counts preserved, full study-mapping
    coverage, shapes equal, and NO original identifier value surviving in
    an anonymized column. Returns the report dict with ``ok``."""
    anonymized_cols = [d["column_name"] for d in mapping["columns_anonymized"]]
    missing_cols = [c for c in anonymized_cols
                    if c not in df_anonymized.columns]
    leaks: Dict[str, int] = {}
    cardinality: Dict[str, Tuple[int, int]] = {}
    for col in anonymized_cols:
        if col in missing_cols:
            continue
        orig_vals = set(map(str, df_original[col].dropna().unique()))
        anon_vals = set(map(str, df_anonymized[col].dropna().unique()))
        survived = orig_vals & anon_vals
        if survived:
            leaks[col] = len(survived)
        cardinality[col] = (len(orig_vals), len(anon_vals))
    missing_studies: List[str] = []
    if "StudyInstanceUID" in df_original.columns:
        originals = set(map(str, df_original["StudyInstanceUID"]
                            .dropna().unique()))
        mapped = {v["original_study_uid"]
                  for v in mapping["study_mappings"].values()}
        missing_studies = sorted(originals - mapped)
    report = {
        "columns_anonymized": len(anonymized_cols),
        "missing_columns": missing_cols,
        "value_leaks": leaks,
        "cardinality": {k: list(v) for k, v in cardinality.items()},
        "missing_study_mappings": len(missing_studies),
        "shape_original": list(df_original.shape),
        "shape_anonymized": list(df_anonymized.shape),
        "ok": (not missing_cols and not leaks and not missing_studies
               and df_original.shape == df_anonymized.shape),
    }
    return report


def save_mapping(mapping: Dict[str, Any], filepath: str | Path) -> Path:
    p = Path(filepath)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(mapping, indent=2, default=str))
    return p


def load_mapping(filepath: str | Path) -> Dict[str, Any]:
    return json.loads(Path(filepath).read_text())


def get_anonymization_report(mapping: Dict[str, Any]) -> str:
    """Human-readable summary (reference :496-520)."""
    lines = [
        "Anonymization Report",
        f"created: {mapping.get('created_date')}",
        f"records: {mapping.get('total_records')}",
        f"original columns: {mapping.get('total_columns_original')}",
        f"salted: {mapping.get('salted')}",
        f"columns anonymized: {len(mapping.get('columns_anonymized', []))}",
    ]
    for item in mapping.get("columns_anonymized", []):
        lines.append(f"  - {item['column_name']}: {item['action']} "
                     f"({item['reason']})")
    lines += [
        f"columns kept: {len(mapping.get('columns_kept', []))}",
        f"study mappings: {len(mapping.get('study_mappings', {}))}",
        f"patient mappings: {len(mapping.get('patient_mappings', {}))}",
        f"value mappings: {len(mapping.get('value_mappings', {}))}",
    ]
    return "\n".join(lines)
