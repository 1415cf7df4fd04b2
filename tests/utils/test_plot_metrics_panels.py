"""Vessel-trend / GT-comparison panel family (reference utils/plot_metrics.py
:525,:1103,:1311,:1502,:1916)."""

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.utils import plot_metrics as pm


@pytest.fixture()
def trajectory():
    rng = np.random.default_rng(0)
    rows = []
    for e in range(4):
        rows.append({
            "epoch": e,
            "prox_rca_stenosis/mae": 20.0 - 3 * e + rng.normal(0, 0.1),
            "prox_rca_stenosis/corr": 0.2 + 0.15 * e,
            "prox_rca_stenosis/auroc@70": 0.5 + 0.08 * e,
            "prox_lad_stenosis/mae": 25.0 - 2 * e,
            "prox_lad_stenosis/corr": 0.1 + 0.1 * e,
            "study_max/auroc@70": 0.55 + 0.07 * e,
            "study_max/n": 100,
        })
    return pd.DataFrame(rows)


def test_comprehensive_panel(trajectory, tmp_path):
    out = pm.plot_multi_epoch_metrics_comprehensive(
        trajectory, out=tmp_path / "m.png"
    )
    assert out is not None and out.exists() and out.stat().st_size > 0


def test_comprehensive_system_filter(trajectory, tmp_path):
    out = pm.plot_multi_epoch_metrics_comprehensive(
        trajectory, out=tmp_path / "right.png", system="right"
    )
    assert out is not None and out.exists()


def test_comprehensive_reads_csv(trajectory, tmp_path):
    csv = tmp_path / "traj.csv"
    trajectory.to_csv(csv, index=False)
    out = pm.plot_multi_epoch_metrics_comprehensive(csv, out=tmp_path / "c.png")
    assert out is not None and out.exists()


def test_combined_performance_best_epochs(trajectory, tmp_path):
    out, summary = pm.create_combined_performance_analysis(
        trajectory, out=tmp_path / "dash.png"
    )
    assert out.exists()
    s = summary.set_index("metric")
    # mae is minimized -> best epoch is the last (monotone decreasing)
    assert s.loc["prox_rca_stenosis/mae", "best_epoch"] == 3
    assert bool(s.loc["prox_rca_stenosis/mae", "minimize"]) is True
    # auroc is maximized -> best epoch 3 too (monotone increasing)
    assert s.loc["study_max/auroc@70", "best_epoch"] == 3
    assert bool(s.loc["study_max/auroc@70", "minimize"]) is False
    # /n columns are not metrics
    assert "study_max/n" not in s.index


def test_gt_comparison_scatter(tmp_path):
    rng = np.random.default_rng(1)
    gt = pd.DataFrame({
        "StudyInstanceUID": [f"s{i}" for i in range(30)],
        "prox_rca_stenosis": rng.uniform(0, 100, 30),
        "prox_lad_stenosis": rng.uniform(0, 100, 30),
    })
    pred = gt.copy()
    pred["prox_rca_stenosis"] += rng.normal(0, 5, 30)
    pred["prox_lad_stenosis"] += rng.normal(0, 15, 30)
    out = pm.plot_ground_truth_comparison(
        pred, gt, out=tmp_path / "gt.png"
    )
    assert out is not None and out.exists()


def test_gt_comparison_empty_returns_none(tmp_path):
    df = pd.DataFrame({"StudyInstanceUID": ["a"]})
    assert pm.plot_ground_truth_comparison(df, df.copy(),
                                           out=tmp_path / "x.png") is None


def test_categorical_trends(tmp_path):
    df = pd.DataFrame({
        "epoch": [0, 1, 2],
        "calcif_severe/recall": [0.1, 0.4, 0.6],
        "calcif_mild/recall": [0.5, 0.6, 0.7],
        "calcif_severe/n": [20, 20, 20],
    })
    out = pm.plot_categorical_trends(df, "calcif",
                                     out=tmp_path / "calc.png")
    assert out is not None and out.exists()


def test_run_summary_includes_trajectory(trajectory, tmp_path):
    trajectory.to_csv(tmp_path / "epoch_trajectory.csv", index=False)
    (tmp_path / "metrics.jsonl").write_text(
        '{"step": 0, "train/loss": 2.0}\n{"step": 1, "train/loss": 1.5}\n'
    )
    outs = pm.plot_run_summary(tmp_path)
    names = {p.name for p in outs}
    assert "multi_epoch_metrics.png" in names
    assert "combined_performance.png" in names


def test_plot_stenosis_predictions_for_study(tmp_path):
    import pandas as pd

    from deepcoro_clip_tpu.utils.plot_metrics import (
        plot_stenosis_predictions_for_study,
    )

    df = pd.DataFrame([{
        "StudyInstanceUID": "S1",
        "pred_prox_rca_stenosis": 65.0, "gt_prox_rca_stenosis": 80.0,
        "pred_mid_lad_stenosis": 20.0, "gt_mid_lad_stenosis": 10.0,
    }])
    out = plot_stenosis_predictions_for_study(
        df, "S1", out=tmp_path / "bars.png", title_suffix="epoch 3")
    assert out is not None and out.exists() and out.stat().st_size > 0
    assert plot_stenosis_predictions_for_study(
        df, "MISSING", out=tmp_path / "x.png") is None


def test_save_plots_to_files(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepcoro_clip_tpu.utils.plot_metrics import save_plots_to_files

    plt.figure(); plt.plot([1, 2])
    plt.figure(); plt.plot([2, 1])
    written = save_plots_to_files(tmp_path)
    assert len(written) == 2 and all(p.exists() for p in written)
    assert not plt.get_fignums()


@pytest.fixture()
def ifr_trajectory():
    rng = np.random.default_rng(1)
    rows = []
    for e in range(5):
        rows.append({
            "epoch": e,
            "prox_rca_stenosis/ifr_mae": 0.10 - 0.012 * e + rng.normal(0, 0.002),
            "prox_lad_stenosis/ifr_mae": 0.12 - 0.010 * e,
            "pda_stenosis/ifr_mae": 0.09 - 0.008 * e,
            "prox_rca_stenosis/mae": 20.0 - 2 * e,
            "pda_stenosis/mae": 18.0 - 2 * e,
        })
    return pd.DataFrame(rows)


def test_system_specific_line_charts(trajectory, tmp_path):
    # "right" system resolves prox_rca from the trajectory columns
    out = pm.plot_system_specific_metrics_line_charts(
        trajectory, "right", out=tmp_path / "sys.png")
    assert out is not None and out.exists() and out.stat().st_size > 0


def test_system_specific_explicit_labels(trajectory, tmp_path):
    out = pm.plot_system_specific_metrics_line_charts(
        trajectory, "LAD only",
        system_vessel_labels=["prox_lad_stenosis"],
        out=tmp_path / "lad.png")
    assert out is not None and out.exists()


def test_system_specific_unknown_system_none(trajectory, tmp_path):
    assert pm.plot_system_specific_metrics_line_charts(
        trajectory, "nonesuch", out=tmp_path / "x.png") is None


def test_coronary_area_line_charts(ifr_trajectory, tmp_path):
    # right dominance area includes prox_rca + pda columns
    out = pm.plot_coronary_artery_specific_metrics_line_charts(
        ifr_trajectory, "right", out=tmp_path / "area.png")
    assert out is not None and out.exists()
    assert pm.plot_coronary_artery_specific_metrics_line_charts(
        ifr_trajectory, "sideways", out=tmp_path / "bad.png") is None


def test_ifr_trends_panel(ifr_trajectory, tmp_path):
    out = pm.plot_ifr_trends(ifr_trajectory, out=tmp_path / "ifr.png")
    assert out is not None and out.exists() and out.stat().st_size > 0


def test_ifr_trends_no_columns_none(trajectory, tmp_path):
    assert pm.plot_ifr_trends(trajectory, out=tmp_path / "n.png") is None
