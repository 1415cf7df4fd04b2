"""Qualitative HTML reports must embed real media (round-1 VERDICT weak:
HTML reports had empty path fields and no media)."""

import numpy as np

from deepcoro_clip_tpu.utils.qualitative import (
    filmstrip_b64,
    load_clip_media,
    write_retrieval_report,
)


def test_filmstrip_from_clip():
    clip = np.random.default_rng(0).integers(
        0, 255, (8, 32, 32, 3)).astype(np.uint8)
    b64 = filmstrip_b64(clip)
    assert isinstance(b64, str) and len(b64) > 100


def test_report_embeds_media_from_paths(tmp_path):
    clip = np.random.default_rng(0).integers(
        0, 255, (8, 32, 32, 3)).astype(np.uint8)
    p = tmp_path / "clip.npy"
    np.save(p, clip)
    records = [
        {"path": str(p), "gt_text": "report A", "gt_rank": 1,
         "topk_texts": ["report A"], "topk_scores": [0.9]},
        {"path": str(tmp_path / "missing.npy"), "gt_text": "report B",
         "gt_rank": 5, "topk_texts": ["x"], "topk_scores": [0.1]},
    ]
    out = write_retrieval_report(tmp_path / "q.html", records, n_best=2,
                                 n_worst=2)
    html = out.read_text()
    assert "data:image/png;base64," in html  # real media embedded
    assert str(p) in html  # real path shown
    # missing file: row still rendered, no crash
    assert "report B" in html


def test_load_clip_media_missing_is_none(tmp_path):
    assert load_clip_media(str(tmp_path / "nope.npy")) is None
