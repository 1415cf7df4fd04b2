"""Classification/regression metric parity vs the reference's sklearn-backed
functions (utils/metrics.py:28-440) and bootstrap-CI agreement."""

import numpy as np
import pytest

from deepcoro_clip_tpu.utils.metrics import (
    _auprc,
    _roc_auc,
    bootstrap_ci,
    regression_metrics,
)


@pytest.fixture(scope="module")
def binary(rng=None):
    r = np.random.default_rng(5)
    labels = r.integers(0, 2, 400).astype(np.float64)
    scores = labels * 0.7 + r.normal(0, 0.6, 400)
    return scores, labels


def test_auroc_parity_with_sklearn(reference, binary):
    from utils.metrics import binary_auc_fn

    scores, labels = binary
    assert _roc_auc(scores, labels) == pytest.approx(
        binary_auc_fn(scores, labels), abs=1e-10)


def test_auroc_ties_parity(reference):
    from utils.metrics import binary_auc_fn

    r = np.random.default_rng(0)
    scores = r.integers(0, 5, 300).astype(np.float64)  # heavy ties
    labels = (scores + r.normal(0, 2, 300) > 2.0).astype(np.float64)
    assert _roc_auc(scores, labels) == pytest.approx(
        binary_auc_fn(scores, labels), abs=1e-10)


def test_auprc_parity_with_sklearn(reference, binary):
    from utils.metrics import binary_auprc_fn

    scores, labels = binary
    assert _auprc(scores, labels) == pytest.approx(
        binary_auprc_fn(scores, labels), abs=1e-10)


def test_regression_metric_parity(reference):
    from utils.metrics import mae_fn, mse_fn, pearson_fn, rmse_fn

    r = np.random.default_rng(3)
    t = r.normal(50, 25, 200)
    p = t + r.normal(0, 10, 200)
    m = regression_metrics(p, t)
    assert m["mae"] == pytest.approx(mae_fn(p, t), rel=1e-12)
    assert m["mse"] == pytest.approx(mse_fn(p, t), rel=1e-12)
    assert m["rmse"] == pytest.approx(rmse_fn(p, t), rel=1e-12)
    assert m["pearson_r"] == pytest.approx(pearson_fn(p, t), rel=1e-9)


def test_bootstrap_ci_agreement(reference, binary):
    """Point estimates identical; percentile CI bounds agree closely (RNG
    streams differ, so bounds match to bootstrap noise, not bitwise)."""
    from utils.metrics import binary_auc_fn, bootstrap_metric

    scores, labels = binary
    ref_pt, ref_lo, ref_hi = bootstrap_metric(
        scores, labels, binary_auc_fn, n_bootstrap=2000)
    pt, lo, hi = bootstrap_ci(
        lambda p, t: _roc_auc(p, t), scores, labels, n_bootstrap=2000)
    assert pt == pytest.approx(ref_pt, abs=1e-10)
    assert lo == pytest.approx(ref_lo, abs=0.02)
    assert hi == pytest.approx(ref_hi, abs=0.02)
    assert lo <= pt <= hi
