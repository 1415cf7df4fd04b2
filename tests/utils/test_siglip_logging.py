"""Per-sample SigLIP debug dumps (reference utils/siglip_logging.py:106-484
and the runner's siglip_debug_* gates)."""

import json
from pathlib import Path

import numpy as np

from deepcoro_clip_tpu.utils.siglip_logging import (
    SiglipDebugLogger,
    build_debug_records,
    siglip_logits,
)


def test_siglip_logits_matches_loss_view():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(4, 8)).astype(np.float32)
    t = rng.normal(size=(6, 8)).astype(np.float32)
    log_temp, bias = np.log(0.07), -10.0
    logits = siglip_logits(v, t, log_temp, bias, logit_clamp=30.0)
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    expect = np.clip(vn @ tn.T / 0.07 + bias, -30, 30)
    np.testing.assert_allclose(logits, expect, rtol=1e-5)
    assert logits.shape == (4, 6)


def test_build_debug_records_margins_and_topk():
    # 2 videos x 4 texts; video0 positives {0,1}, video1 positive {3}
    logits = np.array(
        [[5.0, 3.0, -1.0, -2.0], [-4.0, 0.5, 1.0, 2.0]], np.float32
    )
    pos = np.array([[1, 1, 0, 0], [0, 0, 0, 1]], bool)
    w = np.array([[1.0, 2.5, 0, 0], [0, 0, 0, 4.0]], np.float32)
    recs = build_debug_records(
        ["a.avi", "b.avi"],
        ["t0", "t1", "t2", "t3"],
        pos,
        logits,
        positive_weights=w,
        sample_count=8,
        top_k_negatives=2,
    )
    assert len(recs) == 2
    r0 = recs[0]
    assert r0["path"] == "a.avi"
    assert [p["text"] for p in r0["positives"]] == ["t0", "t1"]
    assert r0["positives"][1]["weight"] == 2.5
    # top negatives sorted by logit descending
    assert [n["logit"] for n in r0["top_negatives"]] == [-1.0, -2.0]
    # margin = min pos - max dumped neg = 3 - (-1) = 4
    assert r0["margin"] == 4.0
    r1 = recs[1]
    assert r1["positives"][0]["text"] == "t3"
    assert r1["top_negatives"][0]["logit"] == 1.0
    assert r1["margin"] == 2.0 - 1.0


def test_logger_appends_jsonl(tmp_path):
    log = SiglipDebugLogger(tmp_path)
    recs = build_debug_records(
        ["x"], ["t"], np.ones((1, 1), bool), np.zeros((1, 1), np.float32)
    )
    p = log.log_batch(3, 17, recs, header={"loss": 1.25, "grad_norm": 0.5})
    p2 = log.log_batch(3, 18, recs)
    assert p == p2 == Path(tmp_path) / "siglip_debug" / "epoch_0003.jsonl"
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["loss"] == 1.25 and lines[0]["step"] == 17
    assert lines[0]["samples"][0]["path"] == "x"


def test_runner_dump_integration(tmp_path):
    """_siglip_debug_dump through a skeleton runner: eval_step mocked, real
    record building + artifact write."""
    from deepcoro_clip_tpu.runners.contrastive import (
        VideoContrastiveLearningRunner,
    )

    class _Cfg:
        siglip_logit_clamp = 30.0
        siglip_debug_sample_count = 2

    class _State:
        step = 7
        params = {"log_temp": np.log(0.1), "logit_bias": -5.0}

    r = object.__new__(VideoContrastiveLearningRunner)
    r.config = _Cfg()
    r.output_dir = Path(tmp_path)
    r.state = _State()
    v = np.eye(2, 4, dtype=np.float32)
    t = np.eye(3, 4, dtype=np.float32)
    r.eval_step = lambda params, batch: {"video_emb": v, "text_emb": t}
    batch = {
        "paths": [["a.avi"], ["b.avi"]],
        "unique_texts": ["alpha", "beta", "gamma"],
        "positive_mask": np.array([[1, 0, 0], [0, 1, 1]], bool),
        "positive_weights": np.ones((2, 3), np.float32),
    }
    r._siglip_debug_dump(
        epoch=0, step=0, batch=batch, device_batch={},
        metrics={"loss": 2.0, "temperature": 0.1, "grad_norm": 1.0},
    )
    out = Path(tmp_path) / "siglip_debug" / "epoch_0000.jsonl"
    entry = json.loads(out.read_text())
    assert entry["logit_bias"] == -5.0
    assert len(entry["samples"]) == 2
    # video0's positive is text0 with logit 1/0.1 - 5 = 5.0
    assert entry["samples"][0]["positives"][0]["logit"] == 5.0
