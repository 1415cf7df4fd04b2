"""Tests for streaming retrieval, semantic metrics, LLRD, plots, dataset
creation."""

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data.dataset_creation import (
    build_siglip_manifests,
    canonical_prompt,
    reconstruct_report,
)
from deepcoro_clip_tpu.utils.retrieval_metrics import (
    compute_retrieval_metrics,
    gt_matrix_from_text_ids,
)
from deepcoro_clip_tpu.utils.retrieval_metrics_streaming import (
    streaming_retrieval_metrics,
)
from deepcoro_clip_tpu.utils.semantic_metrics import semantic_retrieval_metrics


def test_streaming_matches_dense():
    r = np.random.default_rng(0)
    N, M, D = 300, 50, 16
    v = r.normal(size=(N, D)).astype(np.float32)
    t = r.normal(size=(M, D)).astype(np.float32)
    gt = r.integers(0, M, N)
    out = streaming_retrieval_metrics(v, t, gt, recall_k=[1, 5, 10],
                                      block_size=128)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    tn = t / np.linalg.norm(t, axis=1, keepdims=True)
    dense = compute_retrieval_metrics(vn @ tn.T, gt_matrix_from_text_ids(gt, M),
                                      recall_k=[1, 5, 10], ndcg_k=[])
    for k in ["Recall@1", "Recall@5", "Recall@10", "MRR", "MedianRank"]:
        assert out[k] == pytest.approx(dense[k], abs=1e-6), k


def test_semantic_metrics():
    meta = [
        {"tree": "left", "segment": "prox_lad", "severity": "severe"},
        {"tree": "left", "segment": "prox_lad", "severity": "mild"},
        {"tree": "right", "segment": "prox_rca", "severity": "severe"},
    ]
    sim = np.array([[0.9, 0.8, 0.1]])
    out = semantic_retrieval_metrics(sim, [0], meta, topk=2)
    assert out["semantic_tree_match@2"] == 1.0      # both top-2 are left tree
    assert out["semantic_severity_match@2"] == 0.5  # severe, mild


def test_layerwise_lr_decay():
    import jax.numpy as jnp

    from deepcoro_clip_tpu.train.optim import layerwise_lr_decay_scales

    params = {
        "layer0": {"w": jnp.ones((2,))},
        "layer3": {"w": jnp.ones((2,))},
        "head": {"w": jnp.ones((2,))},
    }
    scales = layerwise_lr_decay_scales(params, decay=0.5)
    assert float(scales["layer3"]["w"]) == pytest.approx(1.0)
    assert float(scales["layer0"]["w"]) == pytest.approx(0.125)
    assert float(scales["head"]["w"]) == pytest.approx(1.0)


def test_plots(tmp_path):
    from deepcoro_clip_tpu.utils.plot_metrics import (
        plot_confusion_matrix,
        plot_training_curves,
    )

    (tmp_path / "metrics.jsonl").write_text(
        '{"step": 0, "train/loss": 2.0}\n{"step": 1, "train/loss": 1.0}\n'
    )
    p = plot_training_curves(tmp_path)
    assert p.exists()
    c = plot_confusion_matrix({"tp": 1, "tn": 2, "fp": 0, "fn": 1},
                              out=tmp_path / "cm.png")
    assert c.exists()


def test_dataset_creation_manifests(tmp_path):
    df = pd.DataFrame(
        [
            {"FileName": "a.avi", "video_id": "v0", "Split": "train",
             "prox_lad_stenosis": 80.0, "mid_rca_stenosis": 0.0},
            {"FileName": "b.avi", "video_id": "v1", "Split": "train",
             "prox_lad_stenosis": 80.0},  # same finding -> same text id
        ]
    )
    paths = build_siglip_manifests(df, tmp_path)
    texts = pd.read_csv(paths["texts"])
    edges = pd.read_csv(paths["edges"])
    assert len(texts) == 2  # severe prox_lad (deduped) + normal mid_rca
    severe = texts[texts.disease_severity == "severe"].iloc[0]
    assert severe.tree == "left" and severe.segment == "prox_lad"
    assert (edges.video_id == "v0").sum() == 2
    assert (edges.video_id == "v1").sum() == 1
    # both videos share the severe prompt id
    sev_edges = edges[edges.text_id == severe.text_id]
    assert set(sev_edges.video_id) == {"v0", "v1"}


def test_canonical_prompt_and_report():
    p = canonical_prompt("prox_lad", "severe", 82.0)
    assert "severe stenosis" in p and "proximal LAD" in p and "80%" in p
    assert canonical_prompt("mid_rca", "normal") == "the mid RCA is normal"
    rep = reconstruct_report([("prox_lad", "severe", 80.0, False),
                              ("mid_rca", "normal", None, False)])
    assert "severe" in rep and "normal" in rep


def test_manifests_work_with_siglip_resources(tmp_path):
    from deepcoro_clip_tpu.data.siglip import SiglipResources

    df = pd.DataFrame(
        [{"FileName": "a.avi", "video_id": "v0", "Split": "train",
          "prox_lad_stenosis": 90.0, "prox_rca_stenosis": 10.0}]
    )
    paths = build_siglip_manifests(df, tmp_path)
    res = SiglipResources(paths["texts"], paths["edges"])
    pos = res.sample_positives("v0", k=4)
    assert len(pos) == 2
    assert res.video_is_abnormal("v0")


def test_qualitative_html_report(tmp_path):
    from deepcoro_clip_tpu.utils.qualitative import write_retrieval_report

    recs = [
        {"path": "a.avi", "gt_text": "severe lad", "gt_rank": 1,
         "topk_texts": ["severe lad", "normal"], "topk_scores": [0.9, 0.2],
         "frame": np.random.default_rng(0).random((32, 32, 3))},
        {"path": "b.avi", "gt_text": "normal rca", "gt_rank": 7,
         "topk_texts": ["cto"], "topk_scores": [0.5]},
    ]
    p = write_retrieval_report(tmp_path / "report.html", recs)
    text = p.read_text()
    assert "severe lad" in text and "rank 7" in text
    assert "data:image/png;base64" in text


def test_get_best_epoch(tmp_path):
    from deepcoro_clip_tpu.utils.qualitative import get_best_epoch

    (tmp_path / "metrics.jsonl").write_text(
        '{"step": 0, "val/loss": 2.0}\n{"step": 1, "val/loss": 0.5}\n'
        '{"step": 2, "val/loss": 1.0}\n'
    )
    assert get_best_epoch(tmp_path) == 1
    assert get_best_epoch(tmp_path, key="missing") is None


def test_model_name_presets():
    from deepcoro_clip_tpu.configs import ClipConfig
    from deepcoro_clip_tpu.models.video_encoder import resolve_architecture

    x3d = ClipConfig.from_dict({"model_name": "x3d_s"})
    arch = resolve_architecture(x3d)
    assert arch["vit_dim"] == 256 and arch["vit_depth"] == 8
    # explicit fields override the preset
    custom = ClipConfig.from_dict({"model_name": "x3d_s", "vit_dim": 64})
    assert resolve_architecture(custom)["vit_dim"] == 64
    # mvit preset pools at block 3 (reference 392-token budget)
    mvit = ClipConfig.from_dict({"model_name": "mvit"})
    assert tuple(resolve_architecture(mvit)["vit_pool_stages"]) == (3,)
