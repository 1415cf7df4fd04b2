"""Deployment pipeline pieces (reference scripts/external_validation.py):
multiprocess conversion farm, procedure-status assignment, the reference
view/contrast/diagnostic keep rule."""

import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from external_validation import (  # noqa: E402
    SEGMENTS,
    apply_reference_filter,
    assign_procedure_status,
    convert_dicoms,
    dicom_to_npy,
    prepare_input_columns,
    write_input_template,
)


def test_input_template_roundtrips_through_preprocessing(tmp_path):
    """The emitted template (reference preprocess_dataset_template.csv) is
    a valid input: every spec column parses, ids are renamed, and each
    stenosis column gains its >70 binary."""
    p = tmp_path / "template.csv"
    write_input_template(p)
    df = pd.read_csv(p)
    assert len(df.columns) == 4 * len(SEGMENTS) + 3
    out = prepare_input_columns(df)
    assert {"Patient_ID", "StudyInstanceUID", "DICOMPath"} <= set(out.columns)
    for seg in SEGMENTS:
        assert out[f"{seg}_stenosis_binary"].tolist() == [0, 0]
        assert out[f"{seg}_calcif_binary"].tolist() == [0, 0]
        assert out[f"{seg}_cto"].tolist() == [0, 0]
        assert out[f"{seg}_thrombus"].tolist() == [0, 0]


def test_assign_procedure_status_pci_timeline():
    df = pd.DataFrame({
        "StudyInstanceUID": ["S1", "S1", "S1", "S2"],
        "stent_presence": [0, 1, 0, 0],
        "contrast_agent": [1, 1, 1, 1],
    })
    out = assign_procedure_status(df)
    assert list(out.status) == ["diagnostic", "PCI", "POST_PCI", "diagnostic"]


def test_reference_filter_keeps_diagnostic_coronary_contrast():
    df = pd.DataFrame({
        "StudyInstanceUID": ["S"] * 4,
        "main_structure": [0, 1, 2, 0],     # 2 = non-coronary
        "contrast_agent": [1, 1, 1, 0],     # last: no contrast
        "stent_presence": [0, 0, 0, 0],
    })
    out = apply_reference_filter(df)
    assert len(out) == 2  # rows 0 and 1 only
    assert set(out.main_structure) == {0, 1}


def test_reference_filter_raises_when_empty():
    df = pd.DataFrame({
        "StudyInstanceUID": ["S"],
        "main_structure": [5],
        "contrast_agent": [0],
        "stent_presence": [1],
    })
    with pytest.raises(RuntimeError):
        apply_reference_filter(df)


def test_convert_dicoms_passthrough_and_farm(tmp_path, monkeypatch):
    # fake pydicom so the farm path runs without the real dependency
    class _DS:
        def __init__(self):
            self.pixel_array = np.zeros((3, 8, 8), np.uint16)

    fake = types.ModuleType("pydicom")
    fake.dcmread = lambda p: _DS()
    monkeypatch.setitem(sys.modules, "pydicom", fake)

    clip = tmp_path / "already.npy"
    np.save(clip, np.zeros((2, 4, 4, 3), np.uint8))
    df = pd.DataFrame({
        "DICOMPath": [str(clip), str(tmp_path / "scan1.dcm")],
        "StudyInstanceUID": ["A", "B"],
    })
    out = convert_dicoms(df, tmp_path / "out", workers=1)
    assert len(out) == 2
    assert out.FileName.iloc[0] == str(clip)  # passthrough untouched
    converted = Path(out.FileName.iloc[1])
    assert converted.suffix == ".npy" and converted.exists()
    arr = np.load(converted)
    assert arr.shape == (3, 8, 8, 3) and arr.dtype == np.uint8


def test_dicom_to_npy_without_pydicom(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "pydicom", None)
    # import of None raises ImportError -> graceful None
    assert dicom_to_npy((str(tmp_path / "x.dcm"), str(tmp_path))) is None

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
