"""Full-runner integration test: real dataset on disk -> main() CLI ->
2 epochs of training with validation retrieval + checkpoints + resume
(the reference's integration pattern, tests/test_video_contrastive_learning.py,
driven through the real entry point instead of a duck-typed dataset)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

from deepcoro_clip_tpu.registry import register_all

register_all()


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    r = np.random.default_rng(0)
    rows = []
    for i in range(12):
        p = root / f"clip{i}.npy"
        np.save(p, r.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8))
        rows.append(
            {
                "FileName": str(p),
                "Report": f"left main stenosis {i % 3} severity report",
                "StudyInstanceUID": f"S{i}",
                "Split": "train" if i < 8 else "val",
            }
        )
    csv = root / "data.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)

    cfg = dict(
        pipeline_project="DeepCORO_clip",
        run_mode="train",
        data_filename=str(csv),
        output_dir=str(root / "outputs"),
        epochs=2,
        batch_size=4,
        frames=4,
        resize=32,
        num_workers=2,
        multi_video=False,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=512,
        max_text_length=16, embedding_dim=16, num_heads=2, aggregator_depth=1,
        dropout=0.0, lr=1e-3, precision="fp32", use_pallas_attention=False,
        use_wandb=False, recall_k=[1, 5], ndcg_k=[5],
        mesh_data=-1, mesh_model=1, seed=0,
    )
    cfg_path = root / "config.yaml"
    yaml.safe_dump(cfg, cfg_path.open("w"))
    return root, cfg_path


@pytest.fixture(scope="module")
def trained(workspace):
    from deepcoro_clip_tpu.main import main

    root, cfg_path = workspace
    result = main(["--base_config", str(cfg_path)])
    return root, cfg_path, result


def test_training_completes(trained):
    _, _, result = trained
    assert len(result["history"]) == 2
    losses = [h["loss"] for h in result["history"]]
    assert all(np.isfinite(losses))


def test_validation_retrieval_metrics(trained):
    _, _, result = trained
    h = result["history"][-1]
    assert "val_Recall@1" in h
    assert "val_MRR" in h
    assert 0.0 <= h["val_Recall@1"] <= 1.0


def test_checkpoints_and_artifacts(trained):
    root, _, _ = trained
    runs = list((root / "outputs").rglob("checkpoints"))
    assert runs, "no checkpoint dir created"
    ckpt_dir = runs[0]
    assert (ckpt_dir / "checkpoint").exists()
    assert list(ckpt_dir.glob("best_model_epoch_*"))
    run_dir = ckpt_dir.parent
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "metrics.jsonl").exists()
    val_art = list(run_dir.glob("val/unique_texts_epoch_*.csv"))
    assert val_art
    lines = (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert any("val/Recall@1" in l for l in lines)


def test_resume_from_checkpoint(trained, workspace):
    root, cfg_path = workspace
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.runners.contrastive import VideoContrastiveLearningRunner

    run_dir = list((root / "outputs").rglob("checkpoints"))[0].parent
    cfg = parse_config(
        ["--base_config", str(cfg_path), "--resume_training", "true",
         "--epochs", "3"]
    )
    runner = VideoContrastiveLearningRunner(cfg, output_dir=run_dir)
    start = runner.maybe_resume()
    assert start == 2  # trained 2 epochs already
    assert int(np.asarray(runner.state.step)) > 0

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
