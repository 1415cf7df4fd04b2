"""Severity-bucket parity with the reference's classify_severity
(reference: utils/stenosis_extractor.py — <50 mild, <70 moderate, <90 severe,
>=90 critical; round-1 used 25/50/70/99 which shifts the loss weights)."""

import pytest

from deepcoro_clip_tpu.utils.stenosis_extractor import (
    FINE_SEVERITY_LADDER,
    StenosisExtractor,
    classify_severity,
    percent_to_severity,
)


@pytest.mark.parametrize(
    "pct,expected",
    [
        (0, "none"),
        (0.5, "none"),
        (1, "mild"),
        (30, "mild"),
        (49, "mild"),
        (50, "moderate"),
        (69, "moderate"),
        (70, "severe"),
        (89, "severe"),
        (90, "critical"),
        (100, "critical"),
    ],
)
def test_classify_severity_reference_buckets(pct, expected):
    assert classify_severity(pct) == expected


def test_percent_to_severity_uses_reference_ladder_by_default():
    # 70% is the clinical "significant stenosis" line: must be severe.
    assert percent_to_severity(70) == "severe"
    assert percent_to_severity(49) == "mild"   # round-1 ladder said moderate
    assert percent_to_severity(95) == "critical"  # round-1 said severe <99


def test_fine_ladder_still_available():
    assert percent_to_severity(30, FINE_SEVERITY_LADDER) == "mild"
    assert percent_to_severity(10, FINE_SEVERITY_LADDER) == "minimal"


def test_extractor_emits_reference_vocabulary():
    ex = StenosisExtractor()
    report = (
        "Proximal LAD with 80% stenosis. Mid RCA shows minimal disease. "
        "Distal LCx 55% lesion. Left main 95% subtotal occlusion."
    )
    f = ex.extract(report)
    assert f["prox_lad"].severity == "severe"
    assert f["mid_rca"].severity == "mild"  # 'minimal' folds into mild
    assert f["dist_lcx"].severity == "moderate"
    assert f["left_main"].severity == "critical"
    allowed = {"normal", "mild", "moderate", "severe", "critical"}
    assert all(v.severity in allowed for v in f.values())


def test_extractor_cto_and_keyword_paths():
    ex = StenosisExtractor()
    f = ex.extract("Chronic total occlusion of the mid RCA. The LAD is normal.")
    assert f["mid_rca"].cto and f["mid_rca"].severity == "critical"
    assert f["lad"].severity == "normal"


def test_severity_adjective_without_disease_noun_is_not_a_lesion():
    """'moderate calcifications in the mid LAD' must not fabricate a 55%
    stenosis: the reference's patterns all require the literal word
    'stenosis' (utils/stenosis_extractor.py:146-168). The adjective still
    counts when the clause has a disease noun."""
    ex = StenosisExtractor()
    f = ex.extract("Moderate calcifications in the mid LAD.")
    assert "mid_lad" not in f or f["mid_lad"].percent is None

    f2 = ex.extract("Moderate stenosis of the mid LAD.")
    assert f2["mid_lad"].severity == "moderate"
    f3 = ex.extract("The mid RCA shows severe narrowing.")
    assert f3["mid_rca"].severity == "severe"
