"""Offline study-aggregation rules vs the ACTUAL reference implementations
(/root/reference/utils/{data_aggregation,clean_study_analysis}.py): sentinel
validity, French calcification mapping, dominance/structure-conditional
target vessels, and the full study-level prediction derivation
(VERDICT r3 #7)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data import study_analysis as sa


@pytest.fixture()
def ref_clean(reference):
    return pytest.importorskip("utils.clean_study_analysis")


@pytest.fixture()
def ref_agg(reference):
    return pytest.importorskip("utils.data_aggregation")


def test_is_valid_parity(ref_agg):
    cases = [np.nan, -1, -1.0, "-1", "-1.0", 0, 0.0, "0.0", 0.5, 80,
             "42", None]
    for x in cases:
        for ifr in (False, True):
            try:
                want = ref_agg.is_valid(x, is_ifrhyper=ifr)
            except Exception:
                continue
            assert sa.is_valid(x, is_ifrhyper=ifr) == want, (x, ifr)


def test_map_calcification_value_parity(ref_clean):
    cases = [np.nan, "-1", -1.0, "Pas de calcification",
             "calcifications minimes", "Calcifications modérées",
             "calcifications moderees", "Calcification importantes",
             "Bourgeon calcaire", "2", 3.0, "garbage", 0]
    for x in cases:
        assert sa.map_calcification_value(x) == ref_clean.map_calcification_value(x), x


def test_calcification_mode_fallback_parity(ref_clean):
    cases = [
        [1, 1, 2], [1, 2], [3, 0, 0, 3], [], [None, None], [0], [2, 3, 2, 3],
    ]
    for vals in cases:
        want = ref_clean.calcification_mode_with_fallback(list(vals))
        got = sa.calcification_mode_with_fallback(list(vals))
        if want is None or (isinstance(want, float) and np.isnan(want)):
            assert got is None or (isinstance(got, float) and np.isnan(got))
        else:
            assert got == want, vals


def test_target_vessels_parity(ref_clean):
    for dom in ("right_dominant", "left_dominant", "co_dominant", None,
                "Left Dominant"):
        for hl in (True, False):
            for hr in (True, False):
                want = ref_clean.get_target_vessels_for_study(dom, hl, hr)
                got = sa.get_target_vessels_for_study(dom, hl, hr)
                assert got == want, (dom, hl, hr)


def _merged_df():
    r = np.random.default_rng(0)
    rows = []
    for s in range(6):
        dominance = ["right_dominant", "left_dominant"][s % 2]
        for v in range(4):
            structure = ["Left Coronary", "Right Coronary"][v % 2]
            row = {
                "StudyInstanceUID": f"S{s}",
                "FileName": f"f_{s}_{v}.npy",
                "dominance_name": dominance,
                "main_structure_name": structure,
            }
            for col in sa.DEFAULT_VESSEL_LABELS:
                row[col] = (float(r.integers(0, 100))
                            if r.random() > 0.3 else np.nan)
                base = col.replace("_stenosis", "")
                # np.random.choice over a mixed list would stringify np.nan
                # into "nan"; real CSVs carry float NaN cells, so pick from
                # strings and gate missingness separately
                cats = ["-1", "Pas de calcification", "Calcifications minimes",
                        "Calcifications modérées", "Bourgeon calcaire"]
                row[f"{base}_calcif"] = (np.nan if r.random() < 0.25
                                         else cats[int(r.integers(len(cats)))])
                ifrs = [-1.0, 0.0, 0.82, 0.91, 0.95]
                row[f"{base}_IFRHYPER"] = (np.nan if r.random() < 0.25
                                           else ifrs[int(r.integers(len(ifrs)))])
            for i in range(1, 6):
                row[f"predicted_idx_{i}"] = (int(r.integers(0, 20))
                                             if r.random() > 0.2 else np.nan)
            rows.append(row)
    return pd.DataFrame(rows)


def _gt_mappings():
    r = np.random.default_rng(1)
    m = {"stenosis": {}, "calcification": {}, "ifr": {}}
    for col in sa.DEFAULT_VESSEL_LABELS:
        base = col.replace("_stenosis", "")
        m["stenosis"][col] = {i: float(r.integers(0, 100)) for i in range(20)}
        m["calcification"][f"{base}_calcif"] = {
            i: r.choice(["Pas de calcification", "Calcifications minimes",
                         "Calcifications modérées", "-1"])
            for i in range(20)}
        m["ifr"][f"{base}_IFRHYPER"] = {
            i: float(r.choice([0.0, 0.8, 0.85, 0.9, 0.93]))
            for i in range(20)}
    return m


def test_create_study_level_predictions_parity(ref_clean):
    merged = _merged_df()
    gt = _gt_mappings()
    want = ref_clean.create_study_level_predictions_optimized(
        merged.copy(), gt)
    got = sa.create_study_level_predictions(merged.copy(), gt)
    want = want.sort_values("StudyInstanceUID").reset_index(drop=True)
    got = got.sort_values("StudyInstanceUID").reset_index(drop=True)
    assert set(got.columns) == set(want.columns)
    for col in sorted(want.columns):
        for a, b in zip(got[col].tolist(), want[col].tolist()):
            if isinstance(b, float) and np.isnan(b):
                assert (a is None or (isinstance(a, float) and np.isnan(a))
                        ), (col, a, b)
            elif isinstance(b, float):
                assert a == pytest.approx(b, abs=1e-9), (col, a, b)
            else:
                assert a == b, (col, a, b)
