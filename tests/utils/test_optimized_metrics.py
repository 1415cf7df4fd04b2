"""OptimizedMetricsComputer (reference utils/optimized_metrics.py:11-214):
dedup + pinned bank + chunked metrics, concreteness sanity check."""

import numpy as np
import pytest

from deepcoro_clip_tpu.utils.optimized_metrics import (
    OptimizedMetricsComputer,
    validate_concrete,
)


def _feats():
    r = np.random.default_rng(0)
    texts = ["a", "b", "a", "c", "b", "d"]
    uniq = {t: r.normal(size=8).astype(np.float32) for t in "abcd"}
    tf = np.stack([uniq[t] for t in texts])
    # each video's embedding == its gt text's embedding -> perfect retrieval
    vf = tf.copy()
    return vf, tf, texts


def test_prepare_dedups_first_occurrence():
    omc = OptimizedMetricsComputer(video_chunk_size=2)
    vf, tf, texts = _feats()
    uniq, text_to_idx, gt = omc.prepare_text_features(tf, texts)
    assert [t for t in text_to_idx] == ["a", "b", "c", "d"]
    assert uniq.shape == (4, 8)
    assert gt.tolist() == [0, 1, 0, 2, 1, 3]


def test_streaming_metrics_perfect_retrieval():
    omc = OptimizedMetricsComputer(video_chunk_size=2)
    vf, tf, texts = _feats()
    omc.prepare_text_features(tf, texts)
    m = omc.compute_metrics_streaming(vf, k_values=[1, 2])
    assert m["Recall@1"] == 100.0  # percent, reference convention
    assert m["Recall@2"] == 100.0
    assert m["MRR_V2T"] == pytest.approx(1.0)
    assert m["alignment_score"] == pytest.approx(1.0, abs=1e-5)
    assert m["video_norm"] > 0 and m["text_norm"] > 0


def test_streaming_matches_dense_oracle():
    r = np.random.default_rng(1)
    M, D, N = 37, 16, 64
    bank = r.normal(size=(M, D)).astype(np.float32)
    vids = r.normal(size=(N, D)).astype(np.float32)
    gt = r.integers(0, M, size=N).astype(np.int32)
    omc = OptimizedMetricsComputer(video_chunk_size=7)
    m = omc.compute_metrics_streaming(vids, bank, gt, k_values=[1, 5, 10])
    # dense oracle
    v = vids / np.linalg.norm(vids, axis=1, keepdims=True)
    b = bank / np.linalg.norm(bank, axis=1, keepdims=True)
    sim = v @ b.T
    ranks = 1 + (sim > np.take_along_axis(sim, gt[:, None], 1)).sum(1)
    for k in (1, 5, 10):
        assert m[f"Recall@{k}"] == pytest.approx(100.0 * (ranks <= k).mean())
    assert m["MRR_V2T"] == pytest.approx(float((1.0 / ranks).mean()), rel=1e-5)


def test_tracer_rejected():
    import jax

    with pytest.raises(AssertionError, match="concrete"):
        jax.jit(lambda x: validate_concrete(x) or x)(np.ones(3))


def test_requires_bank():
    omc = OptimizedMetricsComputer()
    with pytest.raises(ValueError, match="text features"):
        omc.compute_metrics_streaming(np.ones((2, 4), np.float32))
