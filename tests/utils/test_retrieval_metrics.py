"""Hand-built similarity matrices (reference: tests/test_retrieval_metrics.py)."""

import numpy as np
import pytest

from deepcoro_clip_tpu.utils.retrieval_metrics import (
    compute_map,
    compute_median_rank,
    compute_mrr,
    compute_ndcg_at_k,
    compute_recall_at_k,
    compute_retrieval_metrics,
    gt_matrix_from_text_ids,
)


def test_perfect_retrieval():
    sim = np.eye(4)
    gt = gt_matrix_from_text_ids([0, 1, 2, 3], 4)
    r = compute_recall_at_k(sim, gt, [1, 5])
    assert r["Recall@1"] == 1.0
    assert compute_mrr(sim, gt) == 1.0
    assert compute_median_rank(sim, gt) == 1.0
    assert compute_map(sim, gt) == 1.0


def test_known_ranks():
    # video0: correct text ranked 2nd; video1: ranked 1st
    sim = np.array([[0.5, 0.9], [0.1, 0.8]])
    gt = gt_matrix_from_text_ids([0, 1], 2)
    r = compute_recall_at_k(sim, gt, [1, 2])
    assert r["Recall@1"] == 0.5
    assert r["Recall@2"] == 1.0
    assert compute_mrr(sim, gt) == pytest.approx((0.5 + 1.0) / 2)
    assert compute_median_rank(sim, gt) == pytest.approx(1.5)


def test_multilabel_gt_shared_text():
    """Two videos share one text: both count that text as relevant
    (reference normalize_gt_sets, utils/retrieval_metrics.py:8-62)."""
    sim = np.array([[0.9, 0.1], [0.8, 0.2]])
    gt = gt_matrix_from_text_ids([0, 0], 2)
    r = compute_recall_at_k(sim, gt, [1])
    assert r["Recall@1"] == 1.0


def test_ndcg_single_relevant():
    sim = np.array([[0.9, 0.5, 0.1]])
    gt = gt_matrix_from_text_ids([1], 3)  # relevant ranked 2nd
    want = (1 / np.log2(3)) / (1 / np.log2(2))
    assert compute_ndcg_at_k(sim, gt, 3) == pytest.approx(want)


def test_full_panel_keys():
    sim = np.random.default_rng(0).random((6, 6))
    gt = gt_matrix_from_text_ids(list(range(6)), 6)
    out = compute_retrieval_metrics(sim, gt, recall_k=[1, 5, 50], ndcg_k=[5],
                                    prefix="val/")
    assert "val/Recall@1" in out and "val/Recall@5" in out
    assert "val/Recall@50" not in out  # k > M skipped
    assert "val/NDCG@5" in out and "val/MAP" in out
