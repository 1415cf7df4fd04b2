"""create_report parity: structured per-vessel predictions -> report text,
byte-for-byte vs the reference (dataset_creation/generate_dataset.py:349-544)."""

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data.dataset_creation import (
    create_report,
    format_calcification_value,
    format_stenosis_value,
    generate_reports,
)

CASES = [
    # right-dominant RCA report: stenosis buckets + calcif + IFR
    dict(main_structure_name="Right Coronary", dominance_name="right_dominant",
         prox_rca_stenosis=95.0, mid_rca_stenosis=60.0, dist_rca_stenosis=0.0,
         pda_stenosis=30.0, posterolateral_stenosis=np.nan,
         prox_rca_calcif="importantes", mid_rca_IFRHYPEREMIE=0.82),
    # left side: CTO overrides stenosis; stent restenosis branches
    dict(main_structure_name="Left Coronary", dominance_name="right_dominant",
         left_main_stenosis=10.0, prox_lad_stenosis=80.0, prox_lad_cto=1,
         mid_lad_stenosis=75.0, mid_lad_stent=1,
         dist_lad_stenosis=5.0, dist_lad_stent=1,
         D1_stenosis=45.0, D1_bifurcation="1.1.0"),
    # left-dominant via the LVP-anatomy override
    dict(main_structure_name="Left Coronary", dominance_name="right_dominant",
         lvp_stenosis=70.0, left_main_stenosis=0.0),
    # collaterals: receiving + giving
    dict(main_structure_name="Right Coronary", dominance_name="right_dominant",
         prox_rca_stenosis=100.0, mid_rca_collateral="LAD",
         pda_stenosis=20.0),
    # invalid side sentinel
    dict(main_structure_name="Unknown", dominance_name="right_dominant"),
    # no findings at all
    dict(main_structure_name="Left Coronary", dominance_name=""),
]


@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
def test_create_report_parity(reference, case):
    from dataset_creation.generate_dataset import create_report as ref_create

    row = pd.Series(case)
    assert create_report(row) == ref_create(row)


def test_formatters_parity(reference):
    from dataset_creation.generate_dataset import (
        format_calcification_value as ref_calc,
        format_stenosis_value as ref_sten,
    )

    for p in (0.0, 10.0, 49.0, 50.0, 69.0, 70.0, 89.0, 90.0, 100.0):
        assert format_stenosis_value(p) == ref_sten(p), p
    for c in ("no calcification", "pas de calcification", "minimes", "mild",
              "modérées", "moderate", "importantes", "severe", "weird"):
        assert format_calcification_value(c) == ref_calc(c), c


def test_generate_reports_adds_column():
    df = pd.DataFrame([
        dict(main_structure_name="Right Coronary",
             dominance_name="right_dominant", prox_rca_stenosis=80.0),
        dict(main_structure_name="Left Coronary",
             dominance_name="left_dominant", prox_lad_stenosis=0.0),
    ])
    out = generate_reports(df)
    assert "Report" in out.columns
    assert "severe stenosis (~80.0%)" in out.Report.iloc[0]
    # the generated dialect round-trips through this repo's extractor
    from deepcoro_clip_tpu.utils.stenosis_extractor import StenosisExtractor

    f = StenosisExtractor().extract(out.Report.iloc[0])
    assert f["prox_rca"].percent == 80.0
