"""PCI embedding-shift analysis (reference manuscript/analyses/
analyze_pci_embeddings.py family)."""

import json

import numpy as np
import pandas as pd

from scripts.analyze_pci_embeddings import (
    analyze,
    cosine_shift,
    permutation_pvalue,
)


def test_cosine_shift_zero_for_identical():
    e = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    np.testing.assert_allclose(cosine_shift(e, e), 0.0, atol=1e-6)
    assert cosine_shift(e, -e).min() > 1.9  # opposite -> shift ~2


def test_analyze_end_to_end(tmp_path):
    r = np.random.default_rng(0)
    D, n = 16, 20
    ids = [f"S{i}" for i in range(n)]
    pre = r.normal(size=(n, D)).astype(np.float32)
    post = pre.copy()
    pci = np.array([1] * 10 + [0] * 10)
    # PCI studies: rotate the embedding hard; no-PCI: tiny jitter
    post[pci == 1] += 2.0 * r.normal(size=(10, D))
    post[pci == 0] += 0.01 * r.normal(size=(10, D))
    np.savez(tmp_path / "pre.npz", embeddings=pre, study_ids=np.array(ids))
    np.savez(tmp_path / "post.npz", embeddings=post, study_ids=np.array(ids))
    pd.DataFrame({"StudyInstanceUID": ids, "pci_performed": pci}).to_csv(
        tmp_path / "status.csv", index=False)

    summary = analyze(tmp_path / "pre.npz", tmp_path / "post.npz",
                      tmp_path / "status.csv", tmp_path / "out",
                      n_bootstrap=100)
    assert summary["n_pci"] == 10 and summary["n_no_pci"] == 10
    assert summary["pci_shift"]["mean"] > summary["no_pci_shift"]["mean"]
    assert summary["permutation_p"] < 0.01
    assert (tmp_path / "out" / "pci_embedding_shift.csv").exists()
    assert (tmp_path / "out" / "pci_shift_hist.png").exists()
    loaded = json.loads((tmp_path / "out" / "summary.json").read_text())
    assert loaded["mean_difference"] > 0


def test_permutation_p_no_effect():
    r = np.random.default_rng(1)
    a, b = r.normal(size=50), r.normal(size=50)
    assert permutation_pvalue(a, b, n_perm=500) > 0.05
