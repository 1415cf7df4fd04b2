"""Numerical parity: retrieval metrics, stenosis extraction, and SigLIP
severity pair-weights vs the ACTUAL reference implementations
(reference: utils/retrieval_metrics.py:65-324, utils/stenosis_extractor.py,
dataloaders/siglip_support.py:592-629).
"""

import numpy as np
import pytest
import torch

from deepcoro_clip_tpu.utils import retrieval_metrics as rm

RTOL = 1e-6


@pytest.fixture(scope="module")
def sims():
    rng = np.random.default_rng(7)
    # 15 videos x 21 texts (odd video count: np.median == torch.median)
    sim = rng.normal(size=(15, 21)).astype(np.float32)
    gt_sets = []
    gt = np.zeros((15, 21), bool)
    for i in range(15):
        k = int(rng.integers(1, 4))
        idx = rng.choice(21, size=k, replace=False)
        gt_sets.append([int(x) for x in idx])
        gt[i, idx] = True
    return sim, gt, gt_sets


def test_recall_at_k_parity(reference, sims):
    from utils.retrieval_metrics import compute_recall_at_k

    sim, gt, gt_sets = sims
    ref = compute_recall_at_k(torch.tensor(sim), gt_sets, k_values=[1, 5, 10])
    ours = rm.compute_recall_at_k(sim, gt, ks=[1, 5, 10])
    for k in (1, 5, 10):
        assert ours[f"Recall@{k}"] == pytest.approx(
            ref[f"Recall@{k}"], rel=RTOL), k


def test_mrr_parity(reference, sims):
    from utils.retrieval_metrics import compute_mrr

    sim, gt, gt_sets = sims
    ref = compute_mrr(torch.tensor(sim), gt_sets)["MRR_V2T"]
    assert rm.compute_mrr(sim, gt) == pytest.approx(ref, rel=RTOL)


def test_median_rank_parity(reference, sims):
    from utils.retrieval_metrics import compute_median_rank

    sim, gt, gt_sets = sims
    ref = compute_median_rank(torch.tensor(sim), gt_sets)
    assert rm.compute_median_rank(sim, gt) == pytest.approx(float(ref))


def test_map_parity(reference, sims):
    from utils.retrieval_metrics import compute_map

    sim, gt, gt_sets = sims
    ref = compute_map(torch.tensor(sim), gt_sets)
    assert rm.compute_map(sim, gt) == pytest.approx(ref, rel=1e-5)


def test_ndcg_parity(reference, sims):
    from utils.retrieval_metrics import compute_ndcg_at_k

    sim, gt, gt_sets = sims
    for k in (3, 5, 10):
        ref = compute_ndcg_at_k(torch.tensor(sim), gt_sets,
                                k_values=[k])[f"NDCG@{k}_V2T"]
        assert rm.compute_ndcg_at_k(sim, gt, k) == pytest.approx(
            ref, rel=1e-5), k


def test_alignment_score_parity(reference):
    from utils.retrieval_metrics import compute_alignment_score

    rng = np.random.default_rng(3)
    v = rng.normal(size=(12, 16)).astype(np.float32)
    t = rng.normal(size=(12, 16)).astype(np.float32)
    ref = compute_alignment_score(torch.tensor(v), torch.tensor(t))
    ours = rm.compute_alignment_score(v, t)
    assert ours == pytest.approx(float(ref), rel=1e-5)


# --------------------------------------------------------------------- #
# stenosis extraction on the reference's own canonical sample reports
# (utils/stenosis_extractor.py:407-450)
# --------------------------------------------------------------------- #

CANONICAL_REPORTS = [
    """the Left Main Coronary Artery (LMCA) has no significant stenosis.
the proximal LAD has no significant stenosis.
the mid LAD has severe stenosis (~70.0%), moderate calcifications, and bifurcation lesion (Medina Bifurcation 1.1.0).
the distal LAD has severe stenosis (~80.0%), and minimal calcifications.
D1 branch has severe stenosis (~80.0%), and minimal calcifications.
D2 branch has no significant stenosis.
the proximal LCX has no significant stenosis.
the distal LCX has no significant stenosis.
OM1 has no significant stenosis.
OM2 has severe stenosis (~70.0%), and minimal calcifications.
Ramus has no significant stenosis.
left posterolateral branch has no significant stenosis.
The coronary circulation is right dominant.""",
    """the proximal RCA has critical stenosis (~95.0%), and minimal calcifications.
the mid RCA has critical stenosis (~100.0%), and minimal calcifications.
the distal RCA has no significant stenosis.
the PDA has no significant stenosis.
the posterolateral branch has no significant stenosis.
The coronary circulation is right dominant.""",
    """the Left Main Coronary Artery (LMCA) has no significant stenosis.
the proximal LAD has no significant stenosis.
the mid LAD has no significant stenosis.""",
]


def test_stenosis_extraction_parity_on_canonical_reports(reference):
    from utils.stenosis_extractor import extract_stenosis_from_report

    from deepcoro_clip_tpu.utils.stenosis_extractor import StenosisExtractor

    ex = StenosisExtractor()
    for rep in CANONICAL_REPORTS:
        ref = extract_stenosis_from_report(rep)
        ours = ex.extract(rep)
        ref_pos = {k: v for k, v in ref.items() if v.percentage > 0}
        ours_pos = {k: f for k, f in ours.items()
                    if f.percent is not None and f.percent > 0}
        assert set(ours_pos) == set(ref_pos)
        for seg, info in ref_pos.items():
            assert ours_pos[seg].percent == pytest.approx(info.percentage), seg
            assert ours_pos[seg].severity in (info.severity, "normal"), seg


def test_severity_classification_parity(reference):
    from utils.stenosis_extractor import classify_severity as ref_classify

    from deepcoro_clip_tpu.utils.stenosis_extractor import classify_severity

    for pct in (0.0, 0.5, 1.0, 10.0, 30.0, 49.9, 50.0, 69.9, 70.0, 89.9,
                90.0, 95.0, 100.0):
        assert classify_severity(pct) == ref_classify(pct), pct


def test_feature_vector_parity_on_reference_dialect(reference):
    """Reports in the reference's own phrasing produce identical fixed-order
    feature vectors from both extractors. (On the synthetic-corpus dialect
    the reference extractor parses nothing — this repo's extractor is a
    strict superset there, covered by tests/utils.)"""
    from utils.stenosis_extractor import get_stenosis_feature_vector

    from deepcoro_clip_tpu.utils.stenosis_extractor import (
        StenosisExtractor, stenosis_feature_vector,
    )

    reports = CANONICAL_REPORTS + [
        "the proximal LAD has moderate stenosis (~55.0%).",
        "OM1 has mild stenosis (~30.0%). the distal RCA has severe stenosis (~75.0%).",
        "the mid LAD has critical stenosis (~99.0%), severe calcifications.",
    ]
    ex = StenosisExtractor()
    for rep in reports:
        ref_vec = get_stenosis_feature_vector(rep)
        ours_vec = stenosis_feature_vector(rep, extractor=ex)
        np.testing.assert_allclose(ours_vec, ref_vec, atol=1e-6, err_msg=rep)


# --------------------------------------------------------------------- #
# SigLIP severity pair weights (dataloaders/siglip_support.py:592-629)
# --------------------------------------------------------------------- #


def _ref_support(reference):
    """Minimal SiglipSupport carrying only what _compute_positive_weight
    reads."""
    from dataloaders.siglip_support import SiglipSupport

    sup = object.__new__(SiglipSupport)
    sup.positive_severity_weights = {
        "normal": 0.75, "mild": 1.25, "moderate": 1.75,
        "severe": 2.5, "critical": 2.5, "cto": 2.5,
    }
    return sup


def _ref_meta(reference, **kw):
    from utils.siglip.single_head_sampler import TextMetadata

    base = dict(text_id="t", prompt_text="x", prompt_type=None, category=None,
                segment=None, bin=None, tree=None, stent=None,
                soft_weight=1.0, disease_severity=None)
    base.update(kw)
    return TextMetadata(**base)


def _ours_resources():
    from deepcoro_clip_tpu.data.siglip import SiglipResources

    res = object.__new__(SiglipResources)
    res.enable_severity_weighting = True
    res.severity_weights = {
        "normal": 0.75, "mild": 1.25, "moderate": 1.75,
        "severe": 2.5, "critical": 2.5, "cto": 2.5,
    }
    res.meta_by_id = {}
    return res


CASES = [
    dict(disease_severity="severe", soft_weight=1.0),
    dict(disease_severity="critical", soft_weight=2.0),
    dict(disease_severity="cto", soft_weight=0.5),
    dict(disease_severity="moderate", soft_weight=1.0),
    dict(disease_severity="mild", soft_weight=0.3),
    dict(disease_severity="normal", soft_weight=1.0),
    dict(disease_severity="normal", soft_weight=0.1),
    dict(disease_severity=None, bin="70-89"),
    dict(disease_severity=None, bin="30-49"),
    dict(disease_severity=None, category="calcification"),
    dict(disease_severity=None, category="normal"),
    dict(disease_severity=None),  # unknown label
    dict(disease_severity="severe", soft_weight=1.0, _edge=3.0),
    dict(disease_severity="normal", soft_weight=1.0, _edge=0.2),
]


@pytest.mark.parametrize("case", CASES)
def test_positive_weight_parity(reference, case):
    case = dict(case)
    edge = case.pop("_edge", 1.0)
    sup = _ref_support(reference)
    meta = _ref_meta(reference, **case)
    expected = sup._compute_positive_weight(meta, edge)

    res = _ours_resources()
    res.meta_by_id["t"] = {
        "severity": (case.get("disease_severity") or "").lower() or None,
        "bin": (case.get("bin") or "").lower() or None,
        "category": (case.get("category") or "").lower() or None,
        "prompt_bucket": None, "segment": None, "tree": None, "stent": None,
        "soft_weight": case.get("soft_weight", 1.0),
    }
    got = res.pair_weight("t", edge)
    assert got == pytest.approx(expected, rel=1e-6), case
