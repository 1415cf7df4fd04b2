import numpy as np
import pytest

from deepcoro_clip_tpu.utils.metrics import (
    binary_metrics,
    bootstrap_ci,
    compute_head_metrics,
    multiclass_metrics,
    regression_metrics,
)


def test_regression_metrics():
    p = np.array([1.0, 2.0, 3.0])
    t = np.array([1.5, 2.5, 3.5])
    m = regression_metrics(p, t)
    assert m["mae"] == pytest.approx(0.5)
    assert m["rmse"] == pytest.approx(0.5)
    assert m["pearson_r"] == pytest.approx(1.0)


def test_binary_auc_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    r = np.random.default_rng(0)
    logits = r.normal(size=200)
    labels = (logits + r.normal(scale=1.5, size=200) > 0).astype(int)
    m = binary_metrics(logits, labels)
    want_auc = sklearn.roc_auc_score(labels, 1 / (1 + np.exp(-logits)))
    assert m["auc"] == pytest.approx(want_auc, abs=1e-9)
    want_ap = sklearn.average_precision_score(labels, 1 / (1 + np.exp(-logits)))
    assert m["auprc"] == pytest.approx(want_ap, abs=1e-9)


def test_binary_confusion_at_threshold():
    logits = np.array([-2.0, -1.0, 1.0, 2.0])
    labels = np.array([0, 0, 1, 1])
    m = binary_metrics(logits, labels, threshold=0.5)
    assert m["confusion"] == {"tp": 2, "tn": 2, "fp": 0, "fn": 0}
    assert m["accuracy"] == 1.0


def test_multiclass_metrics():
    logits = np.array([[3.0, 0, 0], [0, 3.0, 0], [0, 0, 3.0], [3.0, 0, 0]])
    t = np.array([0, 1, 2, 1])
    m = multiclass_metrics(logits, t)
    assert m["accuracy"] == pytest.approx(0.75)


def test_bootstrap_ci_brackets_point():
    r = np.random.default_rng(0)
    p = r.normal(size=500)
    t = p + r.normal(scale=0.1, size=500)
    point, lo, hi = bootstrap_ci(
        lambda a, b: regression_metrics(a, b)["mae"], p, t, n_bootstrap=200
    )
    assert lo <= point <= hi
    assert hi - lo < 0.05


def test_compute_head_metrics_dispatch():
    p = np.array([0.1, 0.9, 0.2, 0.8])
    t = np.array([0, 1, 0, 1])
    out = compute_head_metrics(p, t, "binary", with_ci=True, n_bootstrap=50)
    assert "auc" in out and "auc_ci" in out
