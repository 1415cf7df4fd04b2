"""Synthetic angiography corpus: determinism, visual grounding, manifest."""

import numpy as np
import pytest

from deepcoro_clip_tpu.data.synthetic_angio import (
    Finding,
    InMemorySyntheticDataset,
    generate_corpus,
    render_clip,
    report_text,
    sample_findings,
)


def test_findings_and_reports_deterministic():
    a = sample_findings(7, seed=0)
    b = sample_findings(7, seed=0)
    assert a == b
    assert report_text(a, 7, 0) == report_text(b, 7, 0)
    assert sample_findings(7, seed=1) != a or report_text(a, 7, 1) != report_text(a, 7, 0)


def test_render_deterministic_uint8():
    a = render_clip(3, 0, size=48, frames=4)
    b = render_clip(3, 0, size=48, frames=4)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == (4, 48, 48, 3)


def test_severity_is_visually_monotone():
    """More severe stenosis removes more strongly-lit (contrast-filled)
    vessel pixels — the visual grounding the retrieval model must read."""
    def lit(sev, pct):
        clip = render_clip(5, 0, size=224, frames=4,
                           findings=[Finding(1, sev, pct)])
        return int((clip[-1, :, :, 0] > 200).sum())

    seq = [lit("normal", 0), lit("mild", 30), lit("moderate", 55),
           lit("severe", 80), lit("cto", 0)]
    assert all(a > b for a, b in zip(seq, seq[1:])), seq


def test_cto_removes_distal_runoff():
    full = render_clip(9, 0, size=224, frames=4,
                       findings=[Finding(2, "normal", 0)])
    cto = render_clip(9, 0, size=224, frames=4,
                      findings=[Finding(2, "cto", 0)])
    # contrast-filled (strongly lit) vessel pixels vanish distal to the CTO;
    # the bright collateral ring is dimmer than filled vessel so it does not
    # compensate under this threshold
    lit = lambda c: int((c[-1, :, :, 0] > 200).sum())
    assert lit(full) > lit(cto)


def test_report_parses_with_stenosis_extractor():
    from deepcoro_clip_tpu.utils.stenosis_extractor import StenosisExtractor

    ex = StenosisExtractor()
    f = [Finding(1, "severe", 80), Finding(7, "cto", 0)]
    rep = report_text(f, 0, 0, paraphrase=False)
    parsed = ex.extract(rep)
    assert parsed["prox_lad"].severity == "severe"
    assert parsed["mid_rca"].cto


def test_generate_corpus_manifest(tmp_path):
    manifest = generate_corpus(tmp_path, n_train=4, n_val=2, size=32,
                               frames=4, seed=0)
    import pandas as pd

    df = pd.read_csv(manifest, sep="α", engine="python")
    assert len(df) == 6
    assert set(df.Split) == {"train", "val"}
    clip = np.load(df.FileName.iloc[0])
    assert clip.shape == (4, 32, 32, 3) and clip.dtype == np.uint8


def test_in_memory_dataset_items():
    ds = InMemorySyntheticDataset(n=4, size=32, frames=4)
    item = ds[0]
    assert item["videos"].shape == (1, 4, 32, 32, 3)
    assert item["videos"].dtype == np.uint8
    assert isinstance(item["text"], str) and item["text"]


def test_probe_labels_match_findings():
    from deepcoro_clip_tpu.data.synthetic_angio import (
        SEGMENT_SLUGS, probe_label_columns, probe_labels_for, sample_findings,
    )

    cols = probe_label_columns()
    assert len(cols) == len(SEGMENT_SLUGS) + 3
    for vid in range(50):
        labels = probe_labels_for(vid, 0, 2, True)
        findings = sample_findings(vid, 0, 2, True)
        obstructive = {f.segment for f in findings
                       if f.severity in ("severe", "critical", "cto")}
        for s, slug in enumerate(SEGMENT_SLUGS):
            assert labels[f"stenosis_{slug}"] == float(s in obstructive)
        assert labels["severe_any"] == float(bool(obstructive))
        assert labels["cto_any"] == float(
            any(f.severity == "cto" for f in findings))
        want_max = max((100.0 if f.severity == "cto" else float(f.pct)
                        for f in findings), default=0.0)
        assert labels["max_stenosis_pct"] == want_max


def test_write_probe_labels_csv(tmp_path):
    import pandas as pd

    from deepcoro_clip_tpu.data.synthetic_angio import (
        probe_label_columns, write_probe_labels,
    )

    generate_corpus(tmp_path, n_train=4, n_val=2, size=32, frames=4, seed=0)
    out = write_probe_labels(tmp_path, seed=0)
    df = pd.read_csv(out, sep="α", engine="python")
    assert len(df) == 6
    for c in ["FileName", "Split"] + probe_label_columns():
        assert c in df.columns


def test_study_manifest_groups_and_merges(tmp_path):
    import pandas as pd

    from deepcoro_clip_tpu.data.synthetic_angio import (
        merge_study_findings, sample_findings, write_study_manifest,
    )

    generate_corpus(tmp_path, n_train=12, n_val=6, size=32, frames=4, seed=0)
    out = write_study_manifest(tmp_path, seed=0, videos_per_study=(2, 3))
    df = pd.read_csv(out, sep="α", engine="python")
    assert len(df) == 18  # every clip appears exactly once
    assert df.FileName.is_unique
    for uid, grp in df.groupby("StudyInstanceUID"):
        assert 1 <= len(grp) <= 3  # tail group may be short
        assert grp.Report.nunique() == 1  # one report per study
        assert grp.Split.nunique() == 1  # no split mixing
        # the study report reflects the WORST lesion per segment of members
        clip_ids = [int(p.split("clip_")[1].split(".")[0])
                    for p in grp.FileName]
        merged = merge_study_findings(
            [sample_findings(c, 0, 2, False) for c in clip_ids])
        segs = {f.segment for f in merged}
        assert segs <= set(range(8)) and len(merged) == len(segs)


def test_merge_study_findings_keeps_worst():
    from deepcoro_clip_tpu.data.synthetic_angio import merge_study_findings

    a = Finding(2, "mild", 30)
    b = Finding(2, "critical", 95)
    c = Finding(5, "moderate", 55)
    merged = merge_study_findings([[a, c], [b]])
    by_seg = {f.segment: f for f in merged}
    assert by_seg[2].severity == "critical"
    assert by_seg[5].severity == "moderate"
