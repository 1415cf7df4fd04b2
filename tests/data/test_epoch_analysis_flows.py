"""Epoch-analysis flows (reference clean_study_analysis.py:64-1202):
report merge, text-index GT mappings, single/multi-epoch study drivers,
and the nested-results -> trajectory adaptor feeding the chart panels."""

import json

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data import study_analysis as sa


@pytest.fixture()
def report_and_epoch(tmp_path):
    # report manifest: two studies x two videos, per-vessel labels
    report = pd.DataFrame({
        "FileName": [f"/v/{i}.mp4" for i in range(4)],
        "StudyInstanceUID": ["S0", "S0", "S1", "S1"],
        "main_structure_name": ["Left Coronary", "Right Coronary"] * 2,
        "dominance_name": ["right_dominant"] * 4,
        "prox_rca_stenosis": [np.nan, 60.0, np.nan, 30.0],
        "prox_lad_stenosis": [80.0, np.nan, 20.0, np.nan],
        "prox_rca_calcif": [None, "severe", None, "mild"],
        "prox_rca_IFRHYPER": [np.nan, 0.80, np.nan, 0.92],
    })
    report_csv = tmp_path / "report.csv"
    report.to_csv(report_csv, sep="α", index=False)

    # epoch rows: retrieval indices pointing into the text bank; the bank
    # index's labels come from the merged rows themselves (ground_truth_idx)
    epoch = pd.DataFrame({
        "video_path": [f"/v/{i}.mp4" for i in range(4)] + ["/v/missing.mp4"],
        "ground_truth_idx": [0, 1, 2, 3, 9],
        "predicted_idx_1": [1, 1, 3, 3, 0],
        "predicted_idx_2": [0, 3, 2, 1, 0],
    })
    epoch_csv = tmp_path / "val_epoch3.csv"
    epoch.to_csv(epoch_csv, index=False)
    return report_csv, epoch_csv


def test_merge_drops_unmatched_and_counts(report_and_epoch):
    report_csv, epoch_csv = report_and_epoch
    merged = sa.merge_epoch_with_report(pd.read_csv(epoch_csv),
                                        sa.load_report_data(report_csv))
    assert len(merged) == 4  # /v/missing.mp4 dropped
    assert merged.attrs["n_unmatched"] == 1
    assert "prox_rca_stenosis" in merged.columns


def test_gt_mappings_families(report_and_epoch):
    report_csv, epoch_csv = report_and_epoch
    merged = sa.merge_epoch_with_report(pd.read_csv(epoch_csv),
                                        sa.load_report_data(report_csv))
    maps = sa.create_gt_mappings_from_merged(merged)
    assert maps["stenosis"]["prox_rca_stenosis"][1] == 60.0
    assert maps["calcification"]["prox_rca_calcif"][1] == "severe"
    assert maps["ifr"]["prox_rca_IFRHYPER"][3] == 0.92
    # gt_/pred_ prefixed columns never leak into mappings
    assert all(not c.startswith(("gt_", "pred_"))
               for fam in maps.values() for c in fam)


def test_run_study_analysis_end_to_end(report_and_epoch, tmp_path):
    report_csv, epoch_csv = report_and_epoch
    out = tmp_path / "analysis"
    study_df, metrics = sa.run_study_analysis(report_csv, epoch_csv, out)
    assert set(study_df["StudyInstanceUID"]) == {"S0", "S1"}
    assert (out / "study_predictions.csv").exists()
    assert (out / "study_metrics.json").exists()
    assert set(metrics) == {"stenosis", "calcification", "ifr"}
    # n<=5 validity gate: only 2 studies -> no per-vessel metric published
    assert metrics["stenosis"]["mae"] == {}


def test_compute_epoch_study_metrics_gate_and_values():
    n = 8
    df = pd.DataFrame({
        "gt_prox_rca_stenosis": np.linspace(10, 80, n),
        "pred_prox_rca_stenosis": np.linspace(10, 80, n) + 5.0,
        "gt_prox_rca_calcif": ["severe"] * n,
        "pred_prox_rca_calcif": ["severe"] * 6 + ["mild"] * 2,
        "gt_prox_rca_IFRHYPER": np.linspace(0.7, 0.95, n),
        "pred_prox_rca_IFRHYPER": np.linspace(0.7, 0.95, n),
    })
    m = sa.compute_epoch_study_metrics(df)
    assert m["stenosis"]["mae"]["prox_rca_stenosis"] == pytest.approx(5.0)
    assert m["stenosis"]["corr"]["prox_rca_stenosis"] == pytest.approx(1.0)
    assert m["calcification"]["accuracy"]["prox_rca_calcif"] == \
        pytest.approx(6 / 8)
    assert m["ifr"]["mae"]["prox_rca_IFRHYPER"] == pytest.approx(0.0)


def test_multi_epoch_driver_and_trajectory_adaptor(report_and_epoch,
                                                  tmp_path):
    report_csv, epoch_csv = report_and_epoch
    # second epoch file with shuffled predictions
    e2 = pd.read_csv(epoch_csv)
    e2["predicted_idx_1"] = e2["predicted_idx_1"].iloc[::-1].to_numpy()
    e2_csv = tmp_path / "val_epoch10.csv"
    e2.to_csv(e2_csv, index=False)

    results = sa.run_multi_epoch_study_analysis(
        [epoch_csv, e2_csv], report_csv)
    assert set(results) == {"val_epoch3.csv", "val_epoch10.csv"}
    assert all("metrics" in v for v in results.values())

    from deepcoro_clip_tpu.utils import plot_metrics as pm

    fake = {
        "val_epoch3.csv": {"metrics": {
            "stenosis": {"mae": {"prox_rca_stenosis": 20.0},
                         "corr": {"prox_rca_stenosis": 0.2}},
            "calcification": {"accuracy": {"prox_rca_calcif": 0.5}},
            "ifr": {"mae": {"prox_rca_IFRHYPER": 0.10}, "corr": {}},
        }},
        "val_epoch10.csv": {"metrics": {
            "stenosis": {"mae": {"prox_rca_stenosis": 10.0},
                         "corr": {"prox_rca_stenosis": 0.6}},
            "calcification": {"accuracy": {"prox_rca_calcif": 0.8}},
            "ifr": {"mae": {"prox_rca_IFRHYPER": 0.05}, "corr": {}},
        }},
    }
    traj = pm.epoch_results_to_trajectory(fake)
    assert list(traj["epoch"]) == [3, 10]  # numeric, not lexicographic
    assert traj["prox_rca_stenosis/mae"].tolist() == [20.0, 10.0]
    assert traj["prox_rca_IFRHYPER/ifr_mae"].tolist() == [0.10, 0.05]
    # and it feeds the IFR trend panel directly
    out = pm.plot_ifr_trends(traj, out=tmp_path / "ifr.png")
    assert out is not None and out.exists()
