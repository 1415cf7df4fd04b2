"""scripts/reweight_edges.py vs the reference's effective-number weighting
(reference scripts/reweight_edges.py:19-67)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "scripts"))
from reweight_edges import effective_num_weight, reweight_edges  # noqa: E402


def _manifests():
    texts = pd.DataFrame({
        "text_id": [0, 1, 2, 3],
        "prompt_type": ["stenosis", "stenosis", "cto", "calcif"],
    })
    # prevalence: stenosis edges 4, cto 2, calcif 1, unknown 1
    edges = pd.DataFrame({
        "video": list("abcdefgh"),
        "text_id": [0, 0, 1, 1, 2, 2, 3, 99],
    })
    return edges, texts


def test_rarer_prompts_weigh_more():
    edges, texts = _manifests()
    out = reweight_edges(edges, texts, beta=0.9, cap_percentile=0)
    w = out.set_index("video")["weight"]
    assert w["g"] > w["e"] > w["a"]          # calcif(1) > cto(2) > stenosis(4)
    assert w["h"] == pytest.approx(effective_num_weight(1, 0.9))  # unknown


def test_effective_number_formula():
    # w = (1-beta)/(1-beta^n); n=1 → 1.0 regardless of beta
    assert effective_num_weight(1, 0.999) == pytest.approx(1.0)
    assert effective_num_weight(0) == 1.0
    n, beta = 7, 0.99
    assert effective_num_weight(n, beta) == pytest.approx(
        (1 - beta) / (1 - beta ** n))


def test_percentile_cap():
    edges, texts = _manifests()
    uncapped = reweight_edges(edges, texts, beta=0.9, cap_percentile=0)
    capped = reweight_edges(edges, texts, beta=0.9, cap_percentile=50.0)
    cap = float(np.percentile(uncapped["weight"], 50.0))
    assert capped["weight"].max() == pytest.approx(cap)
    assert (capped["weight"] <= cap + 1e-12).all()


def test_missing_prompt_column_raises():
    edges, texts = _manifests()
    with pytest.raises(ValueError):
        reweight_edges(edges, texts.drop(columns=["prompt_type"]))
