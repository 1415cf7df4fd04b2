"""SingleHeadRetrievalSampler vs the ACTUAL reference implementation
(/root/reference/utils/siglip/single_head_sampler.py): identical (labels,
weights) matrices, text-bank order, and round-robin state evolution on a
shared synthetic prompt catalog, plus the class-statistics maths."""

from __future__ import annotations

import random

import numpy as np
import pytest

from deepcoro_clip_tpu.data.single_head_sampler import (
    SingleHeadRetrievalSampler,
    VideoEntry,
    build_text_catalog,
    compute_class_statistics,
)


def _raw_texts():
    """Synthetic prompt catalog spanning segments/trees/severities/bins,
    including summary prompts (excluded from negatives) and calcification
    (mild-scale negatives)."""
    rows = []
    segs = [("prox_lad", "lad"), ("mid_lad", "lad"), ("d1", "lad"),
            ("prox_rca", "rca"), ("mid_rca", "rca"), ("om1", "lcx")]
    sevs = [("normal", "<30"), ("mild", "30-49"), ("moderate", "50-69"),
            ("severe", "70-89")]
    i = 0
    for seg, tree in segs:
        for sev, b in sevs:
            rows.append({
                "text_id": f"t{i:03d}",
                "prompt_text": f"{seg} {sev}",
                "prompt_type": "seg",
                "category": "normal" if sev == "normal" else "stenosis",
                "segment": seg, "bin": b, "tree": tree,
                "disease_severity": sev,
                "soft_weight": 1.0 + 0.1 * (i % 3),
            })
            i += 1
    rows.append({"text_id": "t900", "prompt_text": "summary a",
                 "category": "summary", "prompt_bucket": "summary"})
    rows.append({"text_id": "t901", "prompt_text": "calcif",
                 "category": "calcification", "segment": "mid_lad",
                 "tree": "lad", "disease_severity": "moderate"})
    return rows


def _videos():
    return [
        ("v0", "SEVERE", "lad",
         [("t003", 1.0), ("t000", 0.8), ("t004", 1.0)]),
        ("v1", "NORMAL", "rca",
         [("t012", 1.0), ("t016", 1.0), ("t020", 0.5)]),
        ("v2", "MILD", "lcx", [("t021", 1.0), ("t901", 1.0)]),
        ("v3", "SEVERE", "lad", [("t011", 1.3), ("t002", 1.0)]),
    ]


@pytest.fixture()
def ref_sampler_mod(reference):
    return pytest.importorskip("utils.siglip.single_head_sampler")


def _build_both(ref_mod, **kw):
    raw = _raw_texts()
    cw, lb = compute_class_statistics(raw)
    ref_cw, ref_lb = ref_mod.compute_class_statistics(raw)
    assert set(cw) == set(ref_cw)
    for k in cw:
        assert cw[k] == pytest.approx(ref_cw[k], abs=1e-12)
        assert lb[k] == pytest.approx(ref_lb[k], abs=1e-12)

    mine = SingleHeadRetrievalSampler(
        build_text_catalog(raw, cw, lb), rng=random.Random(7), **kw)
    ref = ref_mod.SingleHeadRetrievalSampler(
        ref_mod.build_text_catalog(raw, ref_cw, ref_lb),
        ref_cw, ref_lb, rng=random.Random(7), **kw)
    return mine, ref


def _ref_videos(ref_mod):
    return [ref_mod.VideoBatchEntry(video_id=v, exam_severity=s, tree=t,
                                    positive_pairs=list(p))
            for v, s, t, p in _videos()]


def _my_videos():
    return [VideoEntry(video_id=v, exam_severity=s, tree=t,
                       positive_pairs=list(p))
            for v, s, t, p in _videos()]


@pytest.mark.parametrize("kw", [
    dict(max_negatives=6, round_robin=True),
    dict(max_negatives=3, round_robin=True, base_negative_weight=0.1,
         contradiction_boost=2.0),
    dict(max_negatives=0, round_robin=True),
    dict(max_negatives=5, round_robin=False),  # shared seeded rng stream
    dict(max_negatives=4, round_robin=True, min_pos_weight=0.3,
         positive_severity_weights={"normal": 0.4}),
])
def test_prepare_batch_matrices_match(ref_sampler_mod, kw):
    mine, ref = _build_both(ref_sampler_mod, **kw)
    # several epochs: the per-(video, bucket) round-robin STATE must evolve
    # identically, not just a single stateless call
    for epoch in range(3):
        out_m = mine.prepare_batch(_my_videos(), epoch=epoch, phase="train")
        out_r = ref.prepare_batch(_ref_videos(ref_sampler_mod),
                                  epoch=epoch, phase="train")
        assert out_m.text_ids == out_r.text_ids
        np.testing.assert_allclose(out_m.labels, out_r.labels.numpy(),
                                   atol=0, rtol=0)
        np.testing.assert_allclose(out_m.weights, out_r.weights.numpy(),
                                   atol=1e-6, rtol=0)


def test_metadata_and_audit_shape_match(ref_sampler_mod):
    mine, ref = _build_both(ref_sampler_mod, max_negatives=4,
                            round_robin=True)
    out_m = mine.prepare_batch(_my_videos(), epoch=0, phase="val")
    out_r = ref.prepare_batch(_ref_videos(ref_sampler_mod), epoch=0,
                              phase="val")
    assert out_m.audit["phase"] == out_r.audit["phase"] == "val"
    for mm, mr in zip(out_m.text_metadata, out_r.text_metadata):
        for key in ("text_id", "segment", "tree", "category",
                    "is_abnormal", "class_weight"):
            assert mm[key] == mr[key], key
    for vid in out_m.audit["videos"]:
        a_m = out_m.audit["videos"][vid]
        a_r = out_r.audit["videos"][vid]
        assert [p["text_id"] for p in a_m["positives"]] == \
            [p["text_id"] for p in a_r["positives"]]
        assert [n["bucket"] for n in a_m["negatives"]] == \
            [n["bucket"] for n in a_r["negatives"]]
