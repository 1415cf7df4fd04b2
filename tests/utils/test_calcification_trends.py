"""Calcification trend panels (reference utils/plot_metrics.py:1377-1502,
2154-2290): severity-pattern and vessel-system grouping over per-epoch
metrics, rendered from a run dir's metrics.jsonl."""

import json

import numpy as np
import pytest

from deepcoro_clip_tpu.utils.plot_metrics import (
    calcification_by_severity,
    calcification_by_vessel_location,
    plot_calcification_by_severity,
    plot_calcification_by_vessel_location,
    plot_run_summary,
)


@pytest.fixture
def run_dir(tmp_path):
    """A run dir whose metrics.jsonl carries per-class + per-vessel
    calcification validation metrics across 3 epochs (the shape a
    linear-probing run with calcification heads produces)."""
    rows = []
    for epoch in range(3):
        d = {"step": epoch, "val/loss": 1.0 - 0.2 * epoch}
        base = 0.5 + 0.1 * epoch
        d["val/calcif_no_calcif_acc"] = base + 0.30
        d["val/calcif_mild_acc"] = base + 0.10
        d["val/calcif_moderate_acc"] = base
        d["val/calcif_severe_acc"] = base - 0.10
        for vessel in ("left_main_calcif", "prox_lad_calcif", "mid_lad_calcif",
                       "prox_lcx_calcif", "om1_calcif", "prox_rca_calcif",
                       "pda_calcif"):
            d[f"val/{vessel}_acc"] = base + 0.05
        rows.append(d)
    (tmp_path / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    return tmp_path


def test_severity_grouping(run_dir):
    from deepcoro_clip_tpu.utils.plot_metrics import _calcif_epoch_metrics

    epochs, per_epoch = _calcif_epoch_metrics(run_dir)
    assert epochs == [0, 1, 2]
    grouped = calcification_by_severity(per_epoch)
    assert set(grouped) == {"no", "mild", "moderate", "severe"}
    # trends move with the underlying metric across epochs
    assert grouped["severe"]["trend"] == pytest.approx([0.4, 0.5, 0.6])
    assert grouped["no"]["trend"] == pytest.approx([0.8, 0.9, 1.0])
    assert grouped["no"]["metrics"] == ["calcif_no_calcif_acc"]


def test_vessel_location_grouping(run_dir):
    from deepcoro_clip_tpu.utils.plot_metrics import _calcif_epoch_metrics

    _, per_epoch = _calcif_epoch_metrics(run_dir)
    grouped = calcification_by_vessel_location(per_epoch)
    assert set(grouped) == {"Left Main", "LAD System", "LCX System",
                            "RCA System"}
    assert grouped["LAD System"]["metrics"] == [
        "prox_lad_calcif_acc", "mid_lad_calcif_acc"
    ] or set(grouped["LAD System"]["metrics"]) == {
        "prox_lad_calcif_acc", "mid_lad_calcif_acc"}
    assert grouped["RCA System"]["trend"] == pytest.approx([0.55, 0.65, 0.75])


def test_panels_render_from_run_dir(run_dir):
    p1 = plot_calcification_by_severity(run_dir)
    p2 = plot_calcification_by_vessel_location(run_dir)
    assert p1 is not None and p1.exists() and p1.stat().st_size > 0
    assert p2 is not None and p2.exists() and p2.stat().st_size > 0


def test_run_summary_includes_calcification_panels(run_dir):
    outs = plot_run_summary(run_dir)
    names = {p.name for p in outs}
    assert "calcification_by_severity.png" in names
    assert "calcification_by_vessel_location.png" in names


def test_no_calcif_metrics_is_noop(tmp_path):
    (tmp_path / "metrics.jsonl").write_text(
        json.dumps({"step": 0, "val/loss": 1.0}) + "\n"
    )
    assert plot_calcification_by_severity(tmp_path) is None
