"""study_id_mapper (reference utils/study_id_mapper.py:1-126)."""

import pandas as pd
import pytest

from scripts.study_id_mapper import (
    check_study_in_final_metrics,
    find_study_by_filename_pattern,
    main,
)


@pytest.fixture()
def csvs(tmp_path):
    preds = pd.DataFrame({
        "FileName": ["/d/1.2.392.111.4.2_a.npy", "/d/1.2.392.111.4.2_b.npy",
                     "/d/9.9.9_x.npy"],
        "StudyInstanceUID": ["SA", "SB", "SC"],
        "main_structure_name": ["Left Coronary", "Right Coronary",
                                "Left Coronary"],
        "ground_truth_idx": [3, 4, 5],
    })
    p1 = tmp_path / "preds.csv"
    preds.to_csv(p1, index=False)
    study = pd.DataFrame({
        "StudyInstanceUID": ["SA"],
        "prediction_count": [7],
        "dominance_name": ["right_dominant"],
    })
    p2 = tmp_path / "study.csv"
    study.to_csv(p2, index=False)
    return p1, p2


def test_find_by_pattern(csvs):
    p1, _ = csvs
    m = find_study_by_filename_pattern("1.2.392.111.4.2", str(p1))
    assert m["total_predictions"] == 2
    assert sorted(m["unique_study_uids"]) == ["SA", "SB"]
    assert m["study_breakdown"]["SA"]["prediction_count"] == 1
    assert m["study_breakdown"]["SA"]["structures"] == ["Left Coronary"]
    assert find_study_by_filename_pattern("NOPE", str(p1)) is None


def test_check_in_final_metrics(csvs):
    _, p2 = csvs
    found = check_study_in_final_metrics(["SA", "SB"], str(p2))
    assert found["SA"]["prediction_count"] == 7
    assert found["SB"] is None


def test_cli(csvs, capsys):
    p1, p2 = csvs
    rc = main(["1.2.392.111.4.2", str(p1), str(p2)])
    out = capsys.readouterr().out
    assert rc == 0 and "SA" in out and "NOT in study metrics: SB" in out
    assert main(["NOPE", str(p1)]) == 1
