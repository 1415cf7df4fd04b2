"""Semantic SigLIP metrics parity vs the reference
compute_siglip_semantic_metrics (utils/semantic_metrics.py:69-232)."""

import numpy as np
import pytest
import torch

from deepcoro_clip_tpu.utils.semantic_metrics import compute_semantic_metrics

TREES = ["left", "right"]
SEGMENTS = ["prox_lad", "mid_lad", "prox_rca", "om1"]
SEVERITIES = ["normal", "mild", "moderate", "severe"]


def _make_world(rng, n_videos=12, n_texts=30):
    text_ids = [f"t{j}" for j in range(n_texts)]
    lookup = {}
    for tid in text_ids:
        lookup[tid] = {
            "tree": rng.choice(TREES + [None]),
            "segment": rng.choice(SEGMENTS + [None]),
            "disease_severity": rng.choice(SEVERITIES + [None]),
        }
    sim = rng.normal(size=(n_videos, n_texts)).astype(np.float32)
    positives = []
    for _ in range(n_videos):
        k = int(rng.integers(1, 4))
        positives.append([text_ids[j] for j in
                          rng.choice(n_texts, size=k, replace=False)])
    return text_ids, lookup, sim, positives


class _FakeSiglip:
    def __init__(self, lookup):
        self.text_lookup = lookup


class _FakeDataset:
    """Minimal object satisfying the reference function's dataset protocol."""

    def __init__(self, lookup, positives, identifiers):
        self.siglip_enabled = True
        self.siglip = _FakeSiglip(lookup)
        self.video_path_to_idx = {ident: i for i, ident in
                                  enumerate(identifiers)}
        self.video_positive_texts = [[(tid, 1.0) for tid in pos]
                                     for pos in positives]
        self.multi_video_mode = False


def test_semantic_metrics_parity(reference):
    from utils.semantic_metrics import compute_siglip_semantic_metrics

    rng = np.random.default_rng(11)
    text_ids, lookup, sim, positives = _make_world(rng)
    identifiers = [f"v{i}" for i in range(sim.shape[0])]
    ds = _FakeDataset(lookup, positives, identifiers)

    ref = compute_siglip_semantic_metrics(
        torch.tensor(sim), identifiers, ds, text_ids)
    ours = compute_semantic_metrics(sim, positives, lookup, text_ids)

    assert set(ref) == set(ours)
    assert ref, "fixture produced no metrics"
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], rel=1e-6), k


def test_semantic_metrics_small_bank(reference):
    """k clamps to the candidate count on both sides."""
    from utils.semantic_metrics import compute_siglip_semantic_metrics

    rng = np.random.default_rng(5)
    text_ids, lookup, sim, positives = _make_world(rng, n_videos=6, n_texts=4)
    identifiers = [f"v{i}" for i in range(sim.shape[0])]
    ds = _FakeDataset(lookup, positives, identifiers)
    ref = compute_siglip_semantic_metrics(
        torch.tensor(sim), identifiers, ds, text_ids)
    ours = compute_semantic_metrics(sim, positives, lookup, text_ids)
    assert set(ref) == set(ours)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], rel=1e-6), k
