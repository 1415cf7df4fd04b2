"""Study-level aggregation / multi-epoch analysis / contrast merging
(reference: utils/data_aggregation.py, utils/clean_study_analysis.py,
scripts/merge_contrast_with_reports.py)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data.study_analysis import (
    aggregate_study_level_data,
    calcification_mode_with_fallback,
    compute_study_metrics,
    get_vessels_for_dominance,
    run_multi_epoch_analysis,
)

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "scripts"))


def test_dominance_vessel_assignment():
    # canonical groupings (reference utils/vessel_constants.py): lvp always
    # belongs to the left list; the PDA territory flips with dominance
    rca_r, non_r = get_vessels_for_dominance("right_dominant")
    assert "pda_stenosis" in rca_r and "pda_stenosis" not in non_r
    assert "lvp_stenosis" in non_r  # left list always carries lvp
    rca_l, non_l = get_vessels_for_dominance(1)  # 1 = left dominant
    assert "pda_stenosis" not in rca_l and "pda_stenosis" in non_l
    assert "lvp_stenosis" in non_l
    rca_d, _ = get_vessels_for_dominance(None)  # default right
    assert "pda_stenosis" in rca_d


def test_calcification_mode_fallback_prefers_severe():
    assert calcification_mode_with_fallback(["mild", "mild", "severe"]) == "mild"
    assert calcification_mode_with_fallback(["mild", "severe"]) == "severe"
    assert calcification_mode_with_fallback([]) is None


def _video_df():
    return pd.DataFrame([
        # study A: two videos
        {"StudyInstanceUID": "A", "dominance_name": "right_dominant",
         "prox_lad_stenosis": 80.0, "prox_lad_IFRHYPER": 0.0,  # sentinel
         "prox_lad_calcif": "mild", "age": 60, "sex": "m"},
        {"StudyInstanceUID": "A", "dominance_name": "right_dominant",
         "prox_lad_stenosis": 60.0, "prox_lad_IFRHYPER": 0.8,
         "prox_lad_calcif": "severe", "age": 60, "sex": "m"},
        # study B: one video
        {"StudyInstanceUID": "B", "dominance_name": "left_dominant",
         "prox_lad_stenosis": 10.0, "prox_lad_IFRHYPER": 0.92,
         "prox_lad_calcif": None, "age": 71, "sex": "f"},
    ])


def test_aggregate_study_level():
    agg = aggregate_study_level_data(_video_df())
    a = agg[agg.StudyInstanceUID == "A"].iloc[0]
    assert a.prox_lad_stenosis == pytest.approx(70.0)  # mean
    assert a.prox_lad_IFRHYPER == pytest.approx(0.8)   # sentinel excluded
    assert a.prox_lad_calcif == "severe"               # tie -> severe
    assert a.age == pytest.approx(60.0)
    assert a.sex == "m"
    assert len(agg) == 2


def test_compute_study_metrics_auroc_and_mae():
    gt = pd.DataFrame({
        "StudyInstanceUID": list("ABCD"),
        "prox_lad_stenosis": [80.0, 20.0, 75.0, 10.0],
    })
    pred = pd.DataFrame({
        "StudyInstanceUID": list("ABCD"),
        "prox_lad_stenosis": [78.0, 25.0, 60.0, 15.0],
    })
    m = compute_study_metrics(pred, gt)
    v = m["per_vessel"]["prox_lad_stenosis"]
    assert v["n"] == 4
    assert v["mae"] == pytest.approx(np.mean([2, 5, 15, 5]))
    assert v["auroc@70"] == 1.0  # predictions rank the >=70 studies on top
    assert m["stenosis"]["study_max"]["auroc@70"] == 1.0


def test_run_multi_epoch_analysis(tmp_path):
    gt = _video_df()
    gt_csv = tmp_path / "gt.csv"
    gt.to_csv(gt_csv, index=False)
    run = tmp_path / "run" / "val"
    run.mkdir(parents=True)
    for epoch, scale in ((0, 0.5), (1, 1.0)):
        pred = gt[["StudyInstanceUID", "prox_lad_stenosis"]].copy()
        pred["prox_lad_stenosis"] *= scale
        pred.to_csv(run / f"predictions_epoch_{epoch}.csv", index=False)
    df = run_multi_epoch_analysis(tmp_path / "run", gt_csv,
                                  out_csv=tmp_path / "trajectory.csv")
    assert list(df.epoch) == [0, 1]
    # epoch 1 predictions are exact -> MAE 0; epoch 0 is half-scale -> worse
    assert df.loc[1, "prox_lad_stenosis/mae"] == pytest.approx(0.0)
    assert df.loc[0, "prox_lad_stenosis/mae"] > 0
    assert (tmp_path / "trajectory.csv").exists()


def test_merge_contrast_with_reports(tmp_path):
    from merge_contrast_with_reports import (
        expand_pipe_delimited_values,
        merge_contrast_with_reports,
        normalize_accession,
    )

    contrast = pd.DataFrame({
        "AccessionNumber": ["00123", "00123", "456"],
        "volume": ["10 ml", "5ml|7 ml", "8"],
        "agent": ["iohexol", "iohexol|iodixanol", "iohexol"],
    })
    cpath = tmp_path / "contrast.csv"
    contrast.to_csv(cpath, index=False)
    reports = pd.DataFrame({
        "accession": ["123", "456", "789"],
        "Report": ["r1", "r2", "r3"],
    })
    rpath = tmp_path / "reports.csv"
    reports.to_csv(rpath, index=False)

    expanded = expand_pipe_delimited_values(contrast)
    assert len(expanded) == 4  # the packed row explodes into 2

    assert list(normalize_accession(pd.Series(["00123", "1-2 3"]))) == \
        ["123", "123"]

    merged = merge_contrast_with_reports(cpath, rpath,
                                         tmp_path / "merged.csv")
    r123 = merged[merged.accession.astype(str) == "123"].iloc[0]
    assert r123.n_injections == 3  # 1 + 2 expanded
    assert r123.total_volume_ml == pytest.approx(22.0)
    assert "iodixanol" in r123.contrast_agents
    r789 = merged[merged.accession.astype(str) == "789"].iloc[0]
    assert np.isnan(r789.total_volume_ml) or r789.n_injections != r789.n_injections
