"""dev/quality_run.py probe stage, end-to-end at tiny scale on CPU: a tiny
CLIP run's checkpoint feeds the probing runner via the stage's own config
writer, chunked training resumes, and probe_eval emits AUROC + bootstrap CI
+ label-shuffled floors into artifacts/probe.json (VERDICT r3 #1 plumbing —
validated here so flagship chip time can't be lost to wiring bugs)."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]


def _load_quality_run(monkeypatch, repo_override: Path, corpus: Path,
                      run_dir: Path):
    spec = importlib.util.spec_from_file_location(
        "qr_test", REPO / "dev" / "quality_run.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    monkeypatch.setattr(m, "CORPUS", corpus)
    monkeypatch.setattr(m, "RUN_DIR", run_dir)
    monkeypatch.setattr(m, "ART", run_dir / "artifacts")
    monkeypatch.setattr(m, "PROBE_DIR", run_dir / "probe")
    monkeypatch.setattr(m, "BATCH", 2)
    monkeypatch.setattr(m, "PROBE_EPOCHS", 2)
    monkeypatch.setattr(m, "MONO", False)
    return m


def test_probe_stage_end_to_end(tmp_path, monkeypatch):
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.data.synthetic_angio import generate_corpus
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.contrastive import (
        VideoContrastiveLearningRunner,
    )

    register_all()
    corpus = tmp_path / "corpus"
    generate_corpus(corpus, n_train=12, n_val=6, size=32, frames=4, seed=0,
                    max_findings=2, paraphrase=True, coarse_pct=True)
    run_dir = tmp_path / "run"
    run_out = run_dir / "outputs" / "r0"
    run_out.mkdir(parents=True)

    # tiny CLIP training run through the real runner -> checkpoints + meta
    clip_cfg = dict(
        pipeline_project="DeepCORO_clip", run_mode="train",
        data_filename=str(corpus / "data.csv"),
        output_dir=str(run_out), epochs=1, batch_size=2,
        frames=4, resize=32, stride=1, num_workers=1, multi_video=False,
        max_text_length=16, vit_dim=32, vit_depth=1, vit_heads=1,
        vit_patch=[2, 16, 16], vit_pool_stages=[], use_cls_token=True,
        embedding_dim=16, num_heads=2, aggregator_depth=1, dropout=0.0,
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=512,
        lr=1e-3, precision="fp32", use_pallas_attention=False,
        use_wandb=False, seed=0,
    )
    cfg_path = run_dir / "train_config.yaml"
    run_dir.mkdir(exist_ok=True)
    yaml.safe_dump(clip_cfg, cfg_path.open("w"))
    (run_out / "config.yaml").write_text(cfg_path.read_text())
    cfg = parse_config(["--base_config", str(cfg_path)])
    runner = VideoContrastiveLearningRunner(cfg, output_dir=str(run_out))
    runner.train()
    assert (run_out / "checkpoints" / "checkpoint.json").exists()

    qr = _load_quality_run(monkeypatch, tmp_path, corpus, run_dir)
    cfg_probe, best = qr._write_probe_config()
    probe_cfg = yaml.safe_load(cfg_probe.open())
    # geometry mirrored from the train config, stats reused from the meta
    assert probe_cfg["vit_dim"] == 32
    assert probe_cfg["dataset_mean"] is not None
    assert str(run_out / "checkpoints") in probe_cfg[
        "video_encoder_checkpoint_path"]

    # chunked training in-process (subprocess layer exercised elsewhere)
    qr.stage_probe_chunk(0, 1)
    assert qr._probe_run_dir() is not None
    qr.stage_probe_chunk(0, 2)  # resume path: starts at epoch 1

    qr.stage_probe_eval()
    probe = json.loads((run_dir / "artifacts" / "probe.json").read_text())
    heads = probe["heads"]
    assert len(heads) == 11
    for name, e in heads.items():
        if e["task"] == "binary":
            assert "auc" in e and "floor_mean" in e
            # a head with no positive (or no negative) val example has an
            # undefined AUROC — possible only at this tiny val size
            if 0.0 < e["prevalence"] < 1.0:
                assert 0.0 <= e["auc"] <= 1.0
                assert "auc_ci_lo" in e and "auc_ci_hi" in e
        else:
            assert "mae" in e and "mae_ci_lo" in e
    assert probe["n_val"] == 6


def test_study_mode_train_config_and_runner(tmp_path, monkeypatch):
    """DEEPCORO_QR_STUDY=1 wiring at tiny scale: the study manifest groups
    existing clips, the generated train config selects multi-video, and one
    real epoch trains with STUDY-level retrieval validation."""
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.data.synthetic_angio import (
        generate_corpus, write_study_manifest,
    )
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.contrastive import (
        VideoContrastiveLearningRunner,
    )

    register_all()
    corpus = tmp_path / "corpus"
    generate_corpus(corpus, n_train=12, n_val=8, size=32, frames=4, seed=0,
                    max_findings=2, paraphrase=True, coarse_pct=True)
    manifest = write_study_manifest(corpus, seed=0, max_findings=2,
                                    coarse_pct=True,
                                    videos_per_study=(2, 3))
    run_dir = tmp_path / "run"
    qr = _load_quality_run(monkeypatch, tmp_path, corpus, run_dir)
    monkeypatch.setattr(qr, "STUDY", True)
    cfg_d = qr._base_cfg(
        epochs=1, frames=4, resize=32, num_workers=1, max_text_length=16,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        vit_pool_stages=[], embedding_dim=16, num_heads=2,
        aggregator_depth=1, dropout=0.0, text_dim=32, text_depth=1,
        text_heads=2, text_vocab_size=512, precision="fp32",
        use_pallas_attention=False, batch_size=2,
    )
    assert cfg_d["multi_video"] is True and cfg_d["num_videos"] == 4
    assert cfg_d["data_filename"].endswith("study_data.csv")
    assert Path(cfg_d["data_filename"]) == manifest
    p = run_dir / "cfg.yaml"
    run_dir.mkdir(exist_ok=True)
    yaml.safe_dump(cfg_d, p.open("w"))
    cfg = parse_config(["--base_config", str(p)])
    runner = VideoContrastiveLearningRunner(
        cfg, output_dir=str(run_dir / "out"))
    # groups resolved at STUDY granularity, one text per study
    assert all(len(s["paths"]) >= 1 for s in runner.datasets["train"].samples)
    result = runner.train()
    h = result["history"][0]
    assert np.isfinite(h["loss"])
    assert "val_Recall@1" in h  # study-level retrieval validation ran
