"""scripts/merge_inference_csv.py — primary-first union by exam
(generalizes reference scripts/merge_inference_csv.py)."""

import pandas as pd

from scripts.merge_inference_csv import merge_inference_csvs


def _csv(path, rows, cols):
    pd.DataFrame(rows, columns=cols).to_csv(path, sep="α", index=False)
    return str(path)


def test_primary_first_union(tmp_path):
    a = _csv(tmp_path / "a.csv",
             [["s1", "inference", 0.9], ["s2", "inference", 0.8],
              ["s3", "train", 0.1]],
             ["StudyInstanceUID", "Split", "pred"])
    b = _csv(tmp_path / "b.csv",
             [["s2", "inference", 0.5, "x"], ["s4", "inference", 0.4, "y"]],
             ["StudyInstanceUID", "Split", "pred", "extra"])
    m = merge_inference_csvs([a, b])
    # primary keeps s1,s2 (inference only); b contributes only s4
    assert sorted(m["StudyInstanceUID"]) == ["s1", "s2", "s4"]
    assert float(m[m.StudyInstanceUID == "s2"]["pred"].iloc[0]) == 0.8
    # union columns: primary rows get NaN for b-only columns
    assert m[m.StudyInstanceUID == "s1"]["extra"].isna().all()
    assert m[m.StudyInstanceUID == "s4"]["extra"].iloc[0] == "y"


def test_cli_roundtrip(tmp_path):
    from scripts.merge_inference_csv import main

    a = _csv(tmp_path / "a.csv", [["s1", "inference", 1.0]],
             ["StudyInstanceUID", "Split", "pred"])
    b = _csv(tmp_path / "b.csv", [["s9", "inference", 2.0]],
             ["StudyInstanceUID", "Split", "pred"])
    out = tmp_path / "m.csv"
    main([a, b, "-o", str(out)])
    m = pd.read_csv(out, sep="α", engine="python")
    assert len(m) == 2
