"""Linear-probing end-to-end: synthetic labeled studies -> train -> validate
-> inference with embedding capture (reference: tests/test_linear_probing_runner.py)."""

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
    root = tmp_path_factory.mktemp("lp")
    r = np.random.default_rng(0)
    rows = []
    for i in range(16):
        study = f"S{i // 2}"  # 8 studies x 2 clips
        p = root / f"clip{i}.npy"
        np.save(p, r.integers(0, 255, size=(6, 32, 32, 3)).astype(np.uint8))
        rows.append(
            {
                "FileName": str(p),
                "StudyInstanceUID": study,
                "Split": "train" if i < 12 else "val",
                "stenosis": float((i // 2) * 10),
                "cto": float((i // 2) % 2),
                "view_id": i % 3,
            }
        )
    csv = root / "labels.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)
    cfg = dict(
        pipeline_project="DeepCORO_video_linear_probing",
        run_mode="train",
        data_filename=str(csv),
        output_dir=str(root / "out"),
        epochs=2, batch_size=2, frames=4, resize=32, num_workers=2,
        multi_video=True, num_videos=2,
        head_structure={"stenosis": 1, "cto": 1},
        loss_structure={"stenosis": "huber", "cto": "bce_logit"},
        head_task={"stenosis": "regression", "cto": "binary"},
        head_lr={"stenosis": 0.001, "cto": 0.002},
        pooling_mode="attention+cls_token",
        use_view_embeddings=True, view_column="view_id", num_view_classes=3,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        embedding_dim=16, num_heads=2, aggregator_depth=1,
        attention_hidden=8, dropout=0.0, lr=1e-3,
        precision="fp32", use_pallas_attention=False,
        video_freeze_ratio=1.0, ci_n_bootstrap=20,
        save_embeddings=True, use_wandb=False, seed=0,
    )
    cfg_path = root / "cfg.yaml"
    yaml.safe_dump(cfg, cfg_path.open("w"))
    return root, cfg_path


@pytest.fixture(scope="module")
def trained(workspace):
    from deepcoro_clip_tpu.main import main

    root, cfg_path = workspace
    result = main(["--base_config", str(cfg_path)])
    return root, result


def test_probe_training_completes(trained):
    _, result = trained
    assert len(result["history"]) == 2
    assert np.isfinite(result["history"][-1]["loss"])
    assert "loss_stenosis" in result["history"][-1]


def test_per_head_metrics_and_predictions(trained):
    root, result = trained
    h = result["history"][-1]
    assert "val_stenosis/mae" in h
    assert "val_cto/auc" in h
    run_dir = list((root / "out").rglob("checkpoints"))[0].parent
    preds = list(run_dir.glob("val/predictions_epoch_*.csv"))
    assert preds
    df = pd.read_csv(preds[-1])
    assert "stenosis_pred" in df.columns and "cto_target" in df.columns
    assert len(df) == 2  # 2 val studies


def test_frozen_encoder_unchanged(trained, workspace):
    """video_freeze_ratio=1.0: encoder params identical after training."""
    root, cfg_path = workspace
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner
    import jax

    cfg = parse_config(["--base_config", str(cfg_path)])
    run_dir = list((root / "out").rglob("checkpoints"))[0].parent
    runner = LinearProbingRunner(cfg, output_dir=run_dir)
    fresh = runner.state.params["video_encoder"]
    trained_state = runner.ckpt.restore(runner.state, "checkpoint")
    got = trained_state.params["video_encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(fresh),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inference_embeddings(workspace, trained):
    root, cfg_path = workspace
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner

    run_dir = list((root / "out").rglob("checkpoints"))[0].parent
    cfg = parse_config(
        ["--base_config", str(cfg_path), "--run_mode", "val",
         "--dataset_mean", "[127,127,127]", "--dataset_std", "[50,50,50]"]
    )
    runner = LinearProbingRunner(cfg, output_dir=run_dir)
    runner.state = runner.ckpt.restore(runner.state, "checkpoint")
    df = runner.inference(split="val")
    assert len(df) == 2
    assert "stenosis" in df.columns
    emb = np.load(run_dir / "inference" / "study_embeddings.npz")
    assert emb["embeddings"].shape[0] == 2
    # attention+cls_token hybrid: embedding dim is 2*D (reference :192-201)
    assert emb["embeddings"].shape[1] == 32

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow


def test_probe_loads_clip_checkpoint_encoder(tmp_path):
    """The quality-run probe stage loads a CLIP run's best checkpoint into
    the probing encoder (video_encoder_checkpoint_path) — the transfer must
    deliver the CLIP run's video-encoder weights, not a fresh init."""
    import jax

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.runners.contrastive import (
        VideoContrastiveLearningRunner,
    )
    from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner

    r = np.random.default_rng(0)
    rows = []
    for i in range(8):
        p = tmp_path / f"c{i}.npy"
        np.save(p, r.integers(0, 255, size=(4, 32, 32, 3)).astype(np.uint8))
        rows.append({"FileName": str(p), "Report": f"text about {i % 4}",
                     "StudyInstanceUID": f"S{i}",
                     "Split": "train" if i < 6 else "val",
                     "stenosis": float(i * 10)})
    csv = tmp_path / "data.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)

    common = dict(
        frames=4, resize=32, batch_size=2, num_workers=1,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        embedding_dim=16, num_heads=2, aggregator_depth=1, dropout=0.0,
        precision="fp32", use_pallas_attention=False, use_wandb=False,
        seed=0,
    )
    clip_cfg = dict(
        pipeline_project="DeepCORO_clip", run_mode="train",
        data_filename=str(csv), output_dir=str(tmp_path / "clip_out"),
        epochs=1, multi_video=False, max_text_length=16,
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=128,
        lr=1e-3, **common,
    )
    p1 = tmp_path / "clip.yaml"
    yaml.safe_dump(clip_cfg, p1.open("w"))
    cfg = parse_config(["--base_config", str(p1)])
    runner = VideoContrastiveLearningRunner(cfg, output_dir=tmp_path / "cr")
    runner.train()
    ckpts = runner.ckpt
    best = ckpts.find_best() or "checkpoint"
    ckpt_path = tmp_path / "cr" / "checkpoints" / best
    assert ckpt_path.exists()
    clip_enc_tree = jax.device_get(runner.state.params["video_encoder"])

    probe_cfg = dict(
        pipeline_project="DeepCORO_video_linear_probing", run_mode="train",
        data_filename=str(csv), output_dir=str(tmp_path / "probe_out"),
        epochs=1, multi_video=True, num_videos=1,
        head_structure={"stenosis": 1},
        loss_structure={"stenosis": "huber"},
        head_task={"stenosis": "regression"},
        pooling_mode="attention", attention_hidden=8,
        video_encoder_checkpoint_path=str(ckpt_path),
        video_freeze_ratio=1.0, lr=1e-3, ci_n_bootstrap=5,
        **common,
    )
    p2 = tmp_path / "probe.yaml"
    yaml.safe_dump(probe_cfg, p2.open("w"))
    pcfg = parse_config(["--base_config", str(p2)])
    prunner = LinearProbingRunner(pcfg, output_dir=tmp_path / "pr")
    probe_enc_tree = jax.device_get(prunner.state.params["video_encoder"])
    # the shared subtrees (backbone, proj) must transfer EXACTLY; the
    # CLIP-only aggregator and the probing-only per-video pool do not exist
    # on the other side (partial transplant, reference :516-544 semantics)
    for sub in ("backbone", "proj"):
        a = jax.tree_util.tree_leaves(clip_enc_tree[sub])
        b = jax.tree_util.tree_leaves(probe_enc_tree[sub])
        assert len(a) == len(b) and len(a) > 0
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert "pool" in probe_enc_tree and "aggregator" not in probe_enc_tree
