"""Prediction-example / SigLIP-sample / disease-progression visualization
scripts (reference scripts/show_prediction_examples.py,
visualize_siglip_samples.py, visualize_disease_progression.py)."""

import numpy as np
import pandas as pd
import pytest

from scripts.show_prediction_examples import main as show_predictions
from scripts.visualize_disease_progression import main as viz_progression
from scripts.visualize_siglip_samples import main as viz_siglip


@pytest.fixture
def retrieval_run(tmp_path):
    val = tmp_path / "val"
    val.mkdir()
    rows = []
    for i in range(6):
        gt = f"report {i}"
        off = 0 if i < 3 else 1  # rows 3-5 are retrieval misses
        tops = [f"report {(i + j + off) % 6}" for j in range(3)]
        rows.append({
            "path": f"v{i}.npy", "gt_text": gt, "gt_rank": 1 + (i % 3),
            **{f"top{j+1}_text": t for j, t in enumerate(tops)},
            **{f"top{j+1}_score": 1.0 - 0.1 * j for j in range(3)},
        })
    pd.DataFrame(rows).to_csv(val / "retrieval_results_epoch_3.csv",
                              index=False)
    return tmp_path


def test_show_prediction_examples(retrieval_run, capsys):
    show_predictions(["--run_dir", str(retrieval_run), "--num", "3"])
    out = capsys.readouterr().out
    assert "GROUND TRUTH" in out and "EXAMPLE 3" in out
    assert "HIT @1" in out  # top1 == gt rows exist


def test_show_prediction_examples_misses_only(retrieval_run, capsys):
    show_predictions(["--run_dir", str(retrieval_run), "--only", "misses"])
    out = capsys.readouterr().out
    assert "MISS" in out and "HIT" not in out.replace("MISS", "")


def test_visualize_siglip_samples(tmp_path):
    r = np.random.default_rng(0)
    texts = pd.DataFrame([
        {"text_id": "t0", "text": "severe prox rca stenosis", "tree": "right",
         "segment": "prox_rca", "disease_severity": "severe"},
        {"text_id": "t1", "text": "normal lad", "tree": "left",
         "segment": "prox_lad", "disease_severity": "normal"},
    ])
    texts.to_csv(tmp_path / "texts.csv", index=False)
    pd.DataFrame([
        {"video_id": "v0", "text_id": "t0", "weight": 1.0},
        {"video_id": "v1", "text_id": "t1", "weight": 1.0},
    ]).to_csv(tmp_path / "edges.csv", index=False)
    rows = []
    for i in range(2):
        p = tmp_path / f"v{i}.npy"
        np.save(p, r.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8))
        rows.append({"FileName": str(p), "video_id": f"v{i}"})
    pd.DataFrame(rows).to_csv(tmp_path / "videos.csv", index=False)

    out = tmp_path / "frames"
    viz_siglip(["--videos", str(tmp_path / "videos.csv"),
                "--texts", str(tmp_path / "texts.csv"),
                "--edges", str(tmp_path / "edges.csv"),
                "--num-samples", "2", "--frames-per-video", "3",
                "--output", str(out)])
    png = out / "siglip_samples.png"
    assert png.exists() and png.stat().st_size > 0


def test_visualize_disease_progression(tmp_path):
    r = np.random.default_rng(0)
    n = 40
    vessels = r.integers(0, 4, n)
    df = pd.DataFrame({
        "study_id_pre": [f"p{i}" for i in range(n)],
        "study_id_post": [f"q{i}" for i in range(n)],
        "cosine_distance": 0.1 * vessels + r.normal(0, 0.02, n),
        "vessels_new_disease": vessels,
        "vessels_worsened": r.integers(0, 3, n),
    })
    scores = tmp_path / "scores.csv"
    df.to_csv(scores, index=False)
    out = tmp_path / "prog.png"
    viz_progression(["--scores", str(scores), "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0
