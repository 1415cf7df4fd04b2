"""SigLIP resource + dataset tests (reference: dataloaders/siglip_support.py
semantics: severity weights, negative pools, round-robin)."""

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data.siglip import (
    DEFAULT_SEVERITY_WEIGHTS,
    SiglipResources,
    SiglipVideoDataset,
)


@pytest.fixture(scope="module")
def manifests(tmp_path_factory):
    root = tmp_path_factory.mktemp("siglip")
    texts = pd.DataFrame(
        [
            {"text_id": "t0", "text": "normal rca", "tree": "right",
             "segment": "prox_rca", "disease_severity": "normal"},
            {"text_id": "t1", "text": "severe prox rca stenosis", "tree": "right",
             "segment": "prox_rca", "disease_severity": "severe"},
            {"text_id": "t2", "text": "moderate mid rca stenosis", "tree": "right",
             "segment": "mid_rca", "disease_severity": "moderate"},
            {"text_id": "t3", "text": "normal lad", "tree": "left",
             "segment": "prox_lad", "disease_severity": "normal"},
            {"text_id": "t4", "text": "cto of lad", "tree": "left",
             "segment": "prox_lad", "disease_severity": "cto"},
        ]
    )
    texts.to_csv(root / "texts.csv", index=False)
    edges = pd.DataFrame(
        [
            {"video_id": "v0", "text_id": "t1", "weight": 2.0},
            {"video_id": "v0", "text_id": "t2", "weight": 1.0},
            {"video_id": "v1", "text_id": "t0", "weight": 1.0},
            {"video_id": "v2", "text_id": "t3", "weight": 1.0},
            {"video_id": "v2", "text_id": "t4", "weight": 1.5},
            {"video_id": "v3", "text_id": "t1", "weight": 1.0},
            {"video_id": "v4", "text_id": "t3", "weight": 1.0},
        ]
    )
    edges.to_csv(root / "edges.csv", index=False)

    r = np.random.default_rng(0)
    rows = []
    for i in range(5):
        p = root / f"v{i}.npy"
        np.save(p, r.integers(0, 255, size=(6, 16, 16, 3)).astype(np.uint8))
        rows.append({"FileName": str(p), "video_id": f"v{i}",
                     "Split": "train" if i < 3 else "val",
                     "StudyInstanceUID": f"S{i}"})
    pd.DataFrame(rows).to_csv(root / "videos.csv", index=False)
    return root


def test_severity_weighted_positives(manifests):
    res = SiglipResources(manifests / "texts.csv", manifests / "edges.csv")
    pos = dict(res.sample_positives("v0", k=8))
    assert pos["severe prox rca stenosis"] == pytest.approx(
        2.0 * DEFAULT_SEVERITY_WEIGHTS["severe"]
    )
    assert pos["moderate mid rca stenosis"] == pytest.approx(
        1.0 * DEFAULT_SEVERITY_WEIGHTS["moderate"]
    )


def test_abnormality_labels(manifests):
    res = SiglipResources(manifests / "texts.csv", manifests / "edges.csv")
    assert res.video_is_abnormal("v0")      # severe
    assert not res.video_is_abnormal("v1")  # normal only
    assert res.video_is_abnormal("v2")      # cto


def test_round_robin_rotates_with_epoch(manifests):
    res = SiglipResources(manifests / "texts.csv", manifests / "edges.csv")
    e0 = res.sample_positives("v0", k=1, epoch=0)
    e1 = res.sample_positives("v0", k=1, epoch=1)
    assert e0 != e1  # rotation over the 2 positives


def test_negative_pool_prefers_same_segment(manifests):
    res = SiglipResources(manifests / "texts.csv", manifests / "edges.csv")
    # v1's positive is t0 (prox_rca): first negative candidates are
    # same-segment (t1), then same-tree (t2), never its own positive
    negs = res.sample_negatives("v1", k=2)
    texts = [t for t, _ in negs]
    assert "normal rca" not in texts
    assert "severe prox rca stenosis" in texts


def test_siglip_dataset_items(manifests):
    res = SiglipResources(manifests / "texts.csv", manifests / "edges.csv")
    ds = SiglipVideoDataset(
        str(manifests / "videos.csv"), split="train", frames=4, resize=16,
        siglip=res, max_positive_per_video=2, negatives_per_video=2,
    )
    assert len(ds) == 3
    item = ds[0]
    assert len(item["positives"]) >= 1
    assert len(item["negatives"]) == 2
    assert item["videos"].shape == (1, 4, 16, 16, 3)
    labels = ds.abnormal_labels()
    assert labels.sum() == 2


def test_siglip_runner_end_to_end(manifests, tmp_path):
    """Third north-star config: SigLIP multi-positive training step through
    the full runner (SURVEY.md §7 stage 7)."""
    import yaml

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.runners.contrastive import VideoContrastiveLearningRunner

    cfg_d = dict(
        pipeline_project="DeepCORO_clip",
        run_mode="train",
        data_filename=str(manifests / "videos.csv"),
        siglip_texts_path=str(manifests / "texts.csv"),
        siglip_edges_path=str(manifests / "edges.csv"),
        siglip_max_positive_per_video=2,
        siglip_negatives_per_video=2,
        siglip_use_class_aware_sampler=True,
        siglip_abnormal_ratio=0.5,
        loss_name="siglip_pairwise",
        output_dir=str(tmp_path / "out"),
        epochs=1, batch_size=2, frames=4, resize=16, num_workers=1,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=512,
        max_text_length=16, embedding_dim=16, num_heads=2, aggregator_depth=1,
        dropout=0.0, lr=1e-3, precision="fp32", use_pallas_attention=False,
        use_wandb=False, seed=0, split_column="Split",
    )
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg_d, p.open("w"))
    cfg = parse_config(["--base_config", str(p)])
    runner = VideoContrastiveLearningRunner(cfg, output_dir=tmp_path / "run")
    result = runner.train()
    assert np.isfinite(result["history"][0]["loss"])
    # semantic tree/segment/severity panel rides SigLIP validation
    # (reference utils/semantic_metrics.py:69-232)
    val = result["history"][0]
    sem = [k for k in val if k.startswith("val_semantic/")]
    assert "val_semantic/tree_recall@5" in sem
    assert all(np.isfinite(val[k]) for k in sem)


def test_single_head_sampler_runner_end_to_end(manifests, tmp_path):
    """siglip_sampler: single_head routes batch assembly through the
    reference-policy SingleHeadRetrievalSampler (data/single_head_sampler.py)
    + the siglip_single_head loss; one real training epoch must run and the
    collated W matrix must carry sampled-negative weights."""
    import yaml

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.contrastive import (
        VideoContrastiveLearningRunner,
    )

    register_all()
    cfg_d = dict(
        pipeline_project="DeepCORO_clip",
        run_mode="train",
        data_filename=str(manifests / "videos.csv"),
        siglip_texts_path=str(manifests / "texts.csv"),
        siglip_edges_path=str(manifests / "edges.csv"),
        siglip_max_positive_per_video=2,
        siglip_negatives_per_video=2,
        siglip_sampler="single_head",
        siglip_round_robin_sampling=True,
        loss_name="siglip_single_head",
        output_dir=str(tmp_path / "out"),
        epochs=1, batch_size=2, frames=4, resize=16, num_workers=1,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=512,
        max_text_length=16, embedding_dim=16, num_heads=2, aggregator_depth=1,
        dropout=0.0, lr=1e-3, precision="fp32", use_pallas_attention=False,
        use_wandb=False, seed=0, split_column="Split",
    )
    p = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg_d, p.open("w"))
    cfg = parse_config(["--base_config", str(p)])
    runner = VideoContrastiveLearningRunner(cfg, output_dir=tmp_path / "run")

    # the collate path must produce sampler-weighted matrices
    ds = runner.datasets["train"]
    items = [ds[i] for i in range(2)]
    batch = runner._collate(items)
    pos = batch["positive_mask"]
    w = batch["positive_weights"]
    assert pos.shape == w.shape
    assert (w[pos > 0] > 0).all()
    neg_sampled = (pos == 0) & (w > 0)
    assert neg_sampled.any()  # sampled negatives carry their own weights

    result = runner.train()
    assert np.isfinite(result["history"][0]["loss"])

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
