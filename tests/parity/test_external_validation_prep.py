"""Input-spec preprocessing vs the reference's preprocess_dataset
(scripts/external_validation.py:449-607 + preprocess_dataset_README.md).

The reference documents a CSV template (segment stenosis percents,
calcification severity words, CTO/thrombus booleans, ss_* id columns) and
normalizes it before validation. Parity is checked end to end on a frame
exercising every rule: numeric + word calcif columns, bool/int CTO,
string stenosis ("50-70%"), NaN handling, the >70 binary derivation,
id renames, and empty-column dropping."""

import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "scripts"))

from external_validation import (  # noqa: E402
    parse_stenosis_cell,
    prepare_input_columns,
)


@pytest.fixture(scope="module")
def ref_prep(reference):
    """Import the reference's preprocess_dataset with its heavy/absent
    deps stubbed (they sit on code paths these tests never execute)."""
    for name, attrs in {
        "tqdm": {"tqdm": lambda x, **k: x},
        "heartwise_statplots": {},
        "heartwise_statplots.metrics": {
            "MetricsComputer": object, "ClassificationMetrics": object},
        "utils.dicoms": {"process_dicom_video": lambda **k: None},
        "utils.orion_runtime_patches": {
            "apply_orion_runtime_patches": lambda *a, **k: None},
        "orion": {},
        "orion.utils": {},
        "orion.utils.video_training_and_eval": {},
    }.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, str(Path(reference) / "scripts"))
    import importlib

    mod = importlib.import_module("external_validation")
    # the repo's scripts/ dir shadows the name: make sure we really got
    # the reference module
    if not hasattr(mod, "preprocess_dataset"):
        spec = importlib.util.spec_from_file_location(
            "ref_external_validation",
            Path(reference) / "scripts" / "external_validation.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    return mod


def _frame():
    return pd.DataFrame({
        "ss_patient_id": ["P1", "P1", "P2", "P3"],
        "ss_event_cath_id": ["S1", "S1", "S2", "S3"],
        "DICOMPath": ["a.dcm", "b.dcm", "c.dcm", "d.dcm"],
        # stenosis: numeric, string range, decimal string, blank
        "prox_rca_stenosis": [0.0, 71, np.nan, 100],
        "mid_lad_stenosis": ["50-70%", "70.5", "", "no stenosis"],
        # calcif: severity words incl. an unknown word
        "prox_rca_calcif_binary": ["none", "mild", "severe", "weird"],
        # calcif already numeric
        "mid_lad_calcif_binary": [0, 1, np.nan, 1],
        # cto: real bools; thrombus: 0/1 ints (hash-equal to bools)
        "prox_rca_cto": [True, False, False, True],
        "mid_lad_thrombus": [0, 1, 0, 1],
        # all-empty column must be dropped
        "dist_rca_stenosis": [np.nan] * 4,
        "notes": [np.nan] * 4,
    })


def test_parse_stenosis_cell_matches_reference(ref_prep):
    cells = [70, 70.5, "70", "50-70%", "occluded 100", "", "none",
             np.nan, None, "30.25 to 40.75", 0]
    for c in cells:
        a = parse_stenosis_cell(c)
        b = ref_prep._parse_stenosis_value(c)
        if b is None or (isinstance(b, float) and np.isnan(b)):
            assert np.isnan(a), f"{c!r}: {a} vs {b}"
        else:
            assert a == float(b), f"{c!r}: {a} vs {b}"


def test_prepare_input_columns_matches_reference(ref_prep, monkeypatch):
    # pin the reference to inference mode (no target backfill), like ours
    monkeypatch.setenv("DEEPCORO_RUN_MODE", "inference")
    ours = prepare_input_columns(_frame())
    theirs = ref_prep.preprocess_dataset(_frame())

    assert list(ours.columns) == list(theirs.columns)
    for col in ours.columns:
        a, b = ours[col], theirs[col]
        if a.dtype.kind in "fiu" or b.dtype.kind in "fiu":
            np.testing.assert_allclose(
                pd.to_numeric(a, errors="coerce"),
                pd.to_numeric(b, errors="coerce"),
                equal_nan=True, err_msg=col)
        else:
            assert a.tolist() == b.tolist(), col

    # spot-check the derived semantics
    assert "Patient_ID" in ours.columns and "StudyInstanceUID" in ours.columns
    assert ours["prox_rca_stenosis_binary"].tolist() == [0, 1, 0, 1]
    assert ours["mid_lad_stenosis_binary"].tolist() == [0, 1, 0, 0]
    assert "dist_rca_stenosis" not in ours.columns  # empty -> dropped
    assert "notes" not in ours.columns


def test_fill_missing_targets_backfills_and_protects():
    df = _frame()
    out = prepare_input_columns(
        df, target_labels=("prox_rca_stenosis", "brand_new_target"),
        fill_missing_targets=True)
    assert (out["brand_new_target"] == 0.0).all()
    # NaN cells in an existing target are zero-filled
    assert out["prox_rca_stenosis"].notna().all()
