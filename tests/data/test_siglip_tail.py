"""SigLIP support tail (round-1 VERDICT #5): severity/specificity positive
filtering (reference siglip_support.py:510), contradiction-boosted negatives
(reference single_head_sampler.py:770-780), exam-severity priors."""

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data.sampler import SeverityBucketBatchSampler
from deepcoro_clip_tpu.data.siglip import SiglipResources


@pytest.fixture
def resources(tmp_path):
    texts = pd.DataFrame([
        # two texts for the SAME (left, prox_lad) segment, different severity
        {"text_id": "a_mild", "text": "mild prox lad.", "tree": "left",
         "segment": "prox_lad", "disease_severity": "mild"},
        {"text_id": "a_sev", "text": "severe prox lad.", "tree": "left",
         "segment": "prox_lad", "disease_severity": "severe"},
        # a generic (no segment) normal text
        {"text_id": "generic", "text": "normal coronaries.", "tree": "",
         "segment": "", "disease_severity": "normal"},
        # a segmented normal text for prox_lad (the contradiction candidate)
        {"text_id": "a_norm", "text": "prox lad is normal.", "tree": "left",
         "segment": "prox_lad", "disease_severity": "normal"},
        # right-tree text (filtered out under a left-tree hint)
        {"text_id": "r_mod", "text": "moderate mid rca.", "tree": "right",
         "segment": "mid_rca", "disease_severity": "moderate"},
        # another left segment
        {"text_id": "b_mod", "text": "moderate om1.", "tree": "left",
         "segment": "om1", "disease_severity": "moderate"},
    ])
    edges = pd.DataFrame([
        {"video_id": "v1", "text_id": t, "weight": 1.0}
        for t in ["a_mild", "a_sev", "generic", "r_mod", "b_mod"]
    ])
    tp, ep = tmp_path / "texts.csv", tmp_path / "edges.csv"
    texts.to_csv(tp, index=False)
    edges.to_csv(ep, index=False)
    return SiglipResources(str(tp), str(ep))


def test_filter_keeps_most_severe_per_segment(resources):
    out = dict(resources.filter_positive_pairs(
        resources.video_to_positives["v1"]))
    assert "a_sev" in out        # most severe for (left, prox_lad)
    assert "a_mild" not in out   # pruned: same segment, lower severity


def test_filter_tree_hint_drops_off_tree(resources):
    out = dict(resources.filter_positive_pairs(
        resources.video_to_positives["v1"], tree_hint="left"))
    assert "r_mod" not in out
    assert "a_sev" in out and "b_mod" in out


def test_filter_max_segments_caps_by_severity(resources):
    out = resources.filter_positive_pairs(
        resources.video_to_positives["v1"], max_segments=1)
    assert [t for t, _ in out] == ["a_sev"]  # the single most severe


def test_filter_all_normal_prefers_segmented(tmp_path):
    texts = pd.DataFrame([
        {"text_id": "gen", "text": "normal coronaries.", "tree": "",
         "segment": "", "disease_severity": "normal"},
        {"text_id": "seg", "text": "prox lad is normal.", "tree": "left",
         "segment": "prox_lad", "disease_severity": "normal"},
    ])
    edges = pd.DataFrame([
        {"video_id": "v", "text_id": "gen", "weight": 1.0},
        {"video_id": "v", "text_id": "seg", "weight": 1.0},
    ])
    tp, ep = tmp_path / "t.csv", tmp_path / "e.csv"
    texts.to_csv(tp, index=False)
    edges.to_csv(ep, index=False)
    res = SiglipResources(str(tp), str(ep))
    out = dict(res.filter_positive_pairs(res.video_to_positives["v"]))
    assert "seg" in out and "gen" not in out


def test_contradiction_negatives_first_and_boosted(resources):
    # v1's prox_lad positive is SEVERE; "prox lad is normal." contradicts it
    negs = resources.sample_negatives(
        "v1", 3, rng=np.random.default_rng(0),
        contradiction_boost=4.0, contradiction_min_severity="moderate",
    )
    texts = [t for t, _ in negs]
    weights = dict(negs)
    assert texts[0] == "prox lad is normal."
    assert weights["prox lad is normal."] == 4.0
    # non-contradiction negatives keep weight 1.0
    assert all(w == 1.0 for t, w in negs if t != "prox lad is normal.")


def test_no_boost_means_plain_tiering(resources):
    negs = resources.sample_negatives("v1", 3, rng=np.random.default_rng(0))
    assert all(w == 1.0 for _, w in negs)


def test_exam_priors_scale_quotas():
    sev = ["normal"] * 50 + ["severe"] * 50
    s = SeverityBucketBatchSampler(
        sev, batch_size=10, exam_priors={"severe": 3.0}, seed=0, n_batches=10)
    q = s._effective_quotas()
    assert q["severe"] == pytest.approx(0.75)
    assert q["normal"] == pytest.approx(0.25)
    counts = {"normal": 0, "severe": 0}
    for batch in s:
        for i in batch:
            counts[sev[i]] += 1
    assert counts["severe"] > counts["normal"]
