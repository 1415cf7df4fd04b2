"""Distribution/property tests for the SingleHeadRetrievalSampler policy
(VERDICT r3 #6): bucket-priority quota attainment, normal-positive weight
capping, negative weight scales, and round-robin coverage. Exact numerics
vs the reference live in tests/parity/test_single_head_sampler_parity.py."""

from __future__ import annotations

import random

import numpy as np

from deepcoro_clip_tpu.data.single_head_sampler import (
    SingleHeadRetrievalSampler,
    VideoEntry,
    build_text_catalog,
    compute_class_statistics,
    severity_label,
)


def _catalog(n_per=4):
    rows = []
    segs = [("prox_lad", "lad"), ("mid_lad", "lad"), ("d1", "lad"),
            ("prox_rca", "rca"), ("mid_rca", "rca"), ("om1", "lcx")]
    sevs = [("normal", "<30"), ("mild", "30-49"), ("moderate", "50-69"),
            ("severe", "70-89")]
    i = 0
    for seg, tree in segs:
        for sev, b in sevs:
            rows.append({"text_id": f"t{i:03d}", "prompt_text": f"{seg} {sev}",
                         "category": ("normal" if sev == "normal"
                                      else "stenosis"),
                         "segment": seg, "bin": b, "tree": tree,
                         "disease_severity": sev})
            i += 1
    return rows


def _sampler(**kw):
    raw = _catalog()
    cw, lb = compute_class_statistics(raw)
    return SingleHeadRetrievalSampler(
        build_text_catalog(raw, cw, lb), rng=random.Random(0), **kw)


def test_bucket_priority_exhausts_in_order():
    """same_segment negatives must be drained before same_tree before
    cross_tree (reference :624-627 prioritized sampling)."""
    s = _sampler(max_negatives=12, round_robin=True)
    out = s.prepare_batch(
        [VideoEntry("v0", positive_pairs=[("t007", 1.0)])])  # mid_lad severe
    negs = out.audit["videos"]["v0"]["negatives"]
    buckets = [n["bucket"] for n in negs]
    order = {"same_segment": 0, "same_tree": 1, "cross_tree": 2,
             "fallback": 3}
    ranks = [order[b] for b in buckets]
    assert ranks == sorted(ranks), buckets
    assert buckets[0] == "same_segment"


def test_normal_positive_weight_cap():
    """With abnormal positives present, selected normals' severity weight
    must respect the abnormal_weight/3 budget (reference :320-326)."""
    s = _sampler(max_negatives=0, round_robin=True)
    # one severe positive (weight 1.5) + three normal positives (0.25 each):
    # budget = 0.5 -> at most 2 normals (0.25 + 0.25)
    pairs = [("t007", 1.0), ("t004", 1.0), ("t000", 1.0), ("t012", 1.0)]
    out = s.prepare_batch([VideoEntry("v0", positive_pairs=pairs)])
    pos = out.audit["videos"]["v0"]["positives"]
    picked_normals = [p for p in pos
                      if p["severity"] == "normal" and p["weight"] > 0]
    capped = [p for p in pos if p.get("note") == "capped_normal"]
    assert len(picked_normals) == 2
    assert len(capped) == 1
    # round-robin: a later batch rotates WHICH normals are selected
    out2 = s.prepare_batch([VideoEntry("v0", positive_pairs=pairs)])
    picked2 = {p["text_id"] for p in out2.audit["videos"]["v0"]["positives"]
               if p["severity"] == "normal" and p["weight"] > 0}
    assert picked2 != {p["text_id"] for p in picked_normals}


def test_negative_weight_scales():
    """normal 0.25x / mild 0.75x / abnormal 1.5x of the base weight, with
    same-segment 1.5x and same-tree 1.25x proximity boosts
    (reference :749-783)."""
    s = _sampler(max_negatives=12, round_robin=True,
                 base_negative_weight=1.0, contradiction_boost=1.0)
    out = s.prepare_batch(
        [VideoEntry("v0", positive_pairs=[("t007", 1.0)])])  # mid_lad severe
    for n in out.audit["videos"]["v0"]["negatives"]:
        meta = s.catalog[n["text_id"]]
        sev = severity_label(meta)
        base = {"normal": 0.25, "mild": 0.75}.get(sev, 1.5)
        boost = 1.0
        if n["bucket"] == "same_segment":
            boost = 1.5
        elif n["bucket"] == "same_tree":
            boost = 1.25
        assert n["weight"] == np.float32(base * boost), (n, sev)


def test_contradiction_boost_applies():
    """A NORMAL same-segment negative against a >=moderate positive gets the
    contradiction multiplier (reference :770-780)."""
    s = _sampler(max_negatives=12, round_robin=True,
                 base_negative_weight=1.0, contradiction_boost=4.0)
    out = s.prepare_batch(
        [VideoEntry("v0", positive_pairs=[("t007", 1.0)])])  # severe
    contra = [n for n in out.audit["videos"]["v0"]["negatives"]
              if n["bucket"] == "same_segment"
              and severity_label(s.catalog[n["text_id"]]) == "normal"]
    assert contra, "preferred severity for a severe positive is normal"
    for n in contra:
        assert n["weight"] == np.float32(0.25 * 1.5 * 4.0)


def test_round_robin_negative_coverage():
    """Across repeated batches the sampler must cycle through the candidate
    pool, not resample the same negatives (reference round-robin state
    :674-699)."""
    s = _sampler(max_negatives=2, round_robin=True)
    seen = set()
    tree_picks = []
    for _ in range(6):
        out = s.prepare_batch(
            [VideoEntry("v0", positive_pairs=[("t007", 1.0)])])
        negs = out.audit["videos"]["v0"]["negatives"]
        seen.update(n["text_id"] for n in negs)
        tree_picks += [n["text_id"] for n in negs
                       if n["bucket"] == "same_tree"]
    # for a severe positive the preferred pools are narrow (same-segment
    # normal: 1 text; same-tree normals: 2 texts) — coverage means the
    # whole preferred pool is visited and same-tree picks ALTERNATE
    assert len(seen) == 3
    assert len(set(tree_picks)) == 2
    assert tree_picks[0] != tree_picks[1]


def test_matrix_shapes_and_weight_zero_means_unsampled():
    s = _sampler(max_negatives=2, round_robin=True)
    vids = [VideoEntry("v0", positive_pairs=[("t007", 1.0)]),
            VideoEntry("v1", positive_pairs=[("t012", 1.0)])]
    out = s.prepare_batch(vids)
    B, T = out.labels.shape
    assert B == 2 and T == len(out.text_ids)
    assert out.weights.shape == (B, T)
    # every positive has weight > 0; sampled negatives have weight > 0 at
    # label 0; W == 0 <=> the pair was never sampled for that video
    assert (out.weights[out.labels > 0] > 0).all()
    sampled_per_row = (out.weights > 0).sum(axis=1)
    assert (sampled_per_row == 1 + 2).all()  # 1 positive + 2 negatives
