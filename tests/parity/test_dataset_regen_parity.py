"""Status cascade + acquisition-time sort vs the reference implementation
(dataset_creation/generate_dataset.py:540-880, scripts/regenerate_dataset.py).

The reference helpers are pure pandas, so parity is checked end to end on a
synthetic video-level frame exercising every rule branch: filename/fallback
timestamps, midnight spanning, unconfirmed stent=1 (no cascade), confirmed
cascade on one side only, non-coronary rows, congenital / no-stenosis
exclusion."""

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data import dataset_creation as dc


def _frame():
    """12 videos across 3 studies covering the rule matrix."""
    rows = [
        # study A (Left side): diagnostic -> confirmed PCI -> post-PCI
        dict(StudyInstanceUID="A", main_structure_class=0, stent=0,
             fn="A_2023010108{m:02d}00.dcm.avi".format(m=1), st=-1),
        dict(StudyInstanceUID="A", main_structure_class=0, stent=1,
             fn="A_20230101080300.dcm.avi", st=-1),
        dict(StudyInstanceUID="A", main_structure_class=0, stent=0,
             fn="A_20230101080500.dcm.avi", st=-1),
        # study A Right side: untouched by the left-side cascade
        dict(StudyInstanceUID="A", main_structure_class=1, stent=0,
             fn="A_20230101080400.dcm.avi", st=-1),
        # study B: stent=1 but pcidone NOT confirmed on the labelled side ->
        # PCI status for the video itself, NO cascade to the next video
        dict(StudyInstanceUID="B", main_structure_class=1, stent=1,
             fn="B_20230101230000.dcm.avi", st=-1),
        dict(StudyInstanceUID="B", main_structure_class=1, stent=0,
             # crosses midnight: date portion must keep it AFTER the above
             fn="B_20230102001000.dcm.avi", st=-1),
        # study B: row without filename timestamp -> series_time fallback
        dict(StudyInstanceUID="B", main_structure_class=1, stent=0,
             fn="notimestamp.avi", st=120000.0),
        # study C: non-coronary structure with stent=1 (legacy True gate)
        dict(StudyInstanceUID="C", main_structure_class=5, stent=1,
             fn="C_20230101090000.dcm.avi", st=-1),
        dict(StudyInstanceUID="C", main_structure_class=0, stent=0,
             fn="C_20230101091000.dcm.avi", st=-1),
    ]
    df = pd.DataFrame({
        "StudyInstanceUID": [r["StudyInstanceUID"] for r in rows],
        "main_structure_class": [r["main_structure_class"] for r in rows],
        "stent_presence_class": [r["stent"] for r in rows],
        "FileName": [r["fn"] for r in rows],
        "series_time": [r["st"] for r in rows],
        "contrast_agent_class": 1,
        "dominance_class": 0,
        "Split": ["test"] * len(rows),
    })
    # pcidone GT: confirmed on A's left side only
    df["prox_lad_pcidone"] = [0, 1, 0, 0, 0, 0, 0, 0, 0]
    df["prox_rca_pcidone"] = 0
    # stenosis columns: study C's rows carry no data (all -1) -> excluded
    df["prox_lad_stenosis"] = [70, 70, 70, -1, -1, -1, -1, -1, -1]
    df["prox_rca_stenosis"] = [-1, -1, -1, 50, 55, 55, 55, -1, -1]
    df["series_description"] = ["CORO"] * 5 + ["CONGENITAL XYZ"] + ["CORO"] * 3
    # shuffle so the temporal sort has real work to do
    return df.sample(frac=1.0, random_state=7).reset_index(drop=True)


def _ref_modules(reference):
    from dataset_creation.generate_dataset import (  # noqa: E402
        MAIN_STRUCTURE_MAP,
        assign_procedure_status,
        sort_by_study_and_time,
    )

    return MAIN_STRUCTURE_MAP, sort_by_study_and_time, assign_procedure_status


def test_sort_and_status_parity(reference):
    ref_map, ref_sort, ref_status = _ref_modules(reference)
    df = _frame()

    ours = df.copy()
    ours["main_structure_name"] = ours["main_structure_class"].map(
        dc.MAIN_STRUCTURE_NAMES)
    ours = dc.sort_by_acquisition_time(ours)
    ours = dc.assign_procedure_status(ours)

    theirs = df.copy()
    theirs["main_structure_name"] = theirs["main_structure_class"].map(ref_map)
    theirs = ref_sort(theirs)
    theirs = ref_status(theirs)

    assert dc.MAIN_STRUCTURE_NAMES == ref_map
    assert list(ours.index) == list(theirs.index), "temporal order differs"
    assert list(ours["status"]) == list(theirs["status"])
    # the rule matrix itself (guards against BOTH implementations drifting)
    by_fn = ours.set_index("FileName")["status"]
    assert by_fn["A_20230101080100.dcm.avi"] == "diagnostic"
    assert by_fn["A_20230101080300.dcm.avi"] == "PCI"
    assert by_fn["A_20230101080500.dcm.avi"] == "POST_PCI"
    assert by_fn["A_20230101080400.dcm.avi"] == "diagnostic"  # other side
    assert by_fn["B_20230101230000.dcm.avi"] == "PCI"  # unconfirmed stent
    assert by_fn["B_20230102001000.dcm.avi"] == "diagnostic"  # no cascade
    assert by_fn["C_20230101090000.dcm.avi"] == "PCI"  # legacy non-coronary


def test_acq_time_midnight_and_fallback():
    t1 = dc.acquisition_time_from_filename("B_20230101230000.dcm.avi")
    t2 = dc.acquisition_time_from_filename("B_20230102001000.dcm.avi")
    assert t1 is not None and t2 is not None and t2 > t1
    assert dc.acquisition_time_from_filename("notimestamp.avi") is None


def test_inference_filter_and_regeneration():
    df = _frame()
    out = dc.regenerate_dataset(df)
    # eligible: diagnostic + LCA/RCA + contrast, minus congenital (B's
    # midnight row) and minus rows whose every stenosis is -1/NaN
    assert set(out["status"]) == {"diagnostic"}
    fns = set(out["FileName"])
    # B's unconfirmed stent=1 never cascades: its later right-side video
    # (series_time fallback row, stenosis 55) stays diagnostic and eligible
    assert "notimestamp.avi" in fns
    assert "A_20230101080100.dcm.avi" in fns
    assert "A_20230101080400.dcm.avi" in fns  # right side, has stenosis 50
    assert "B_20230102001000.dcm.avi" not in fns  # congenital
    assert "C_20230101091000.dcm.avi" not in fns  # all stenosis -1
    assert (out["Split"] == "inference").all()
    assert out["Report"].str.len().gt(0).all()
