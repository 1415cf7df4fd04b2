"""Reversible-with-mapping anonymization (reference
utils/anonyme_dataset_coro.py:158-520)."""

import numpy as np
import pandas as pd

from deepcoro_clip_tpu.data.anonymize import (
    anonymize_value,
    anonymize_with_tracking,
    get_anonymization_report,
    recover_original_info,
    recover_original_value,
    verify_anonymization_integrity,
)


def _df():
    return pd.DataFrame({
        "StudyInstanceUID": ["1.2.3", "1.2.4", "1.2.3"],
        "Patient_ID": ["P1", "P2", "P1"],
        "PatientName": ["DOE^JOHN", "ROE^JANE", "DOE^JOHN"],
        "PatientBirthDate": ["1961-04-12", "19700230", "1961-04-12"],
        "FileName": ["a.npy", "b.npy", "c.npy"],
        "prox_rca_stenosis": [10.0, 80.0, np.nan],
        "Report": ["normal", "severe", "normal"],
    })


def test_prefix_scheme():
    assert anonymize_value("1.2.3", "StudyInstanceUID").startswith("Study")
    assert anonymize_value("P1", "Patient_ID").startswith("PATIENT_")
    assert anonymize_value("DOE", "PatientName").startswith("NAME_")
    assert anonymize_value("1961-04-12", "PatientBirthDate") == "YEAR_1961"
    # unparseable date falls back to a hash token, never the raw value
    tok = anonymize_value("19700230", "PatientBirthDate")
    assert tok.startswith("DATE_")
    assert anonymize_value(np.nan, "PatientName") is None


def test_tracking_roundtrip_and_integrity():
    df = _df()
    anon, mapping = anonymize_with_tracking(df, salt="s3cret")
    # identifiers replaced, labels/report untouched
    assert not set(anon.StudyInstanceUID) & set(df.StudyInstanceUID)
    assert list(anon.Report) == list(df.Report)
    assert list(anon.prox_rca_stenosis.fillna(-1)) == \
        list(df.prox_rca_stenosis.fillna(-1))
    # same original value -> same token (join keys survive)
    assert anon.StudyInstanceUID[0] == anon.StudyInstanceUID[2]
    # inversion through the mapping
    tok = anon.StudyInstanceUID[0]
    assert recover_original_value(tok, "StudyInstanceUID", mapping) == "1.2.3"
    assert recover_original_info(tok, mapping)["original_study_uid"] == "1.2.3"
    report = verify_anonymization_integrity(df, anon, mapping)
    assert report["ok"], report
    assert not report["value_leaks"]
    txt = get_anonymization_report(mapping)
    assert "columns anonymized: 5" in txt


def test_integrity_catches_leak():
    df = _df()
    anon, mapping = anonymize_with_tracking(df, salt="s")
    anon.loc[0, "PatientName"] = "DOE^JOHN"  # simulate a missed value
    report = verify_anonymization_integrity(df, anon, mapping)
    assert not report["ok"]
    assert report["value_leaks"] == {"PatientName": 1}


def test_unsalted_matches_reference_scheme():
    """salt=None reproduces the reference's bare-md5 token scheme."""
    import hashlib

    # "StudyInstanceUID".split("_")[0] is the whole name (no underscore) —
    # the reference's prefix is the full column name for UID columns
    tok = anonymize_value("1.2.3", "StudyInstanceUID", salt=None)
    want = "StudyInstanceUID_" + hashlib.md5(b"1.2.3").hexdigest()[:16]
    assert tok == want
