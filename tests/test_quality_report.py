"""QUALITY.md writer smoke test (dev/_quality_report.py).

Fabricates two seed run dirs and checks that the report carries the
convergence analysis, the seed-variance table, per-epoch wall time, and
the tokenizer statement (VERDICT r2 #2/#4 evidence surface).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _fake_history(n, r1_final):
    hist = []
    for i in range(n):
        frac = (i + 1) / n
        hist.append({
            "epoch": i,
            "loss": 2.5 * (1 - frac) + 0.3,
            "val_loss": 2.2 * (1 - frac) + 0.3,
            "val_Recall@1": r1_final * frac,
            "val_Recall@5": min(0.95, 3 * r1_final * frac),
            "val_Recall@10": min(0.99, 4 * r1_final * frac),
            "val_MedianRank": max(2.0, 60.0 * (1 - frac)),
            "epoch_seconds": 600.0,
        })
    return hist


def _write_seed(repo: Path, seed: int, n_epochs: int, r1: float):
    art = repo / f".quality_run_v2_s{seed}" / "artifacts"
    art.mkdir(parents=True)
    (art / "train.json").write_text(json.dumps({
        "history": _fake_history(n_epochs, r1),
        "wall_seconds": 600.0 * n_epochs,
        "config": {"epochs": n_epochs, "batch_size": 16, "lr": 1e-4,
                   "max_text_length": 128, "seed": seed,
                   "tokenizer": "WordPieceTokenizer"},
    }))
    (art / "tiers.json").write_text(json.dumps({
        "1-finding": {"Recall@1": 0.4, "Recall@5": 0.9, "Recall@10": 0.95,
                      "MedianRank": 2.0},
        "3-findings-ood": {"Recall@1": 0.1, "Recall@5": 0.4,
                           "Recall@10": 0.6, "MedianRank": 8.0},
    }))
    (art / "scaling.json").write_text(json.dumps({
        "recipe_B16_lr0.0001": {"final": 1.1, "ln_B": 2.773,
                                "escaped_plateau": True},
        "B16_lr0.0001": {"final": 2.773, "ln_B": 2.773,
                         "escaped_plateau": False},
    }))


def _write_partial_seed(repo: Path, seed: int, n_epochs: int, r1: float):
    """A seed mid-run: no artifacts/train.json, only the runner's
    metrics.jsonl — exercises the _history_from_metrics fallback."""
    out = repo / f".quality_run_v2_s{seed}" / "outputs" / "proj" / "run"
    out.mkdir(parents=True)
    lines = []
    for h in _fake_history(n_epochs, r1):
        ep = h.pop("epoch")
        lines.append(json.dumps({
            "step": ep, "train/loss": h["loss"],
            "train/epoch_seconds": h["epoch_seconds"]}))
        lines.append(json.dumps({
            "step": ep, "val/loss": h["val_loss"],
            "val/Recall@1": h["val_Recall@1"],
            "val/Recall@5": h["val_Recall@5"],
            "val/Recall@10": h["val_Recall@10"],
            "val/MedianRank": h["val_MedianRank"]}))
    (out / "metrics.jsonl").write_text("\n".join(lines))


def test_report_writes_convergence_and_seed_variance(tmp_path):
    from dev._quality_report import write_report

    (tmp_path / "docs").mkdir()
    _write_seed(tmp_path, 0, 25, 0.30)
    _write_partial_seed(tmp_path, 1, 10, 0.20)
    write_report(tmp_path, 6000, 1024, 16, 128)

    md = (tmp_path / "QUALITY.md").read_text()
    assert "WordPieceTokenizer" in md
    assert "## Convergence" in md
    assert "95% of its best" in md
    assert "## Seed variance" in md
    assert "| 1 | 10 |" in md  # second-seed row present
    assert "3-findings-ood" in md
    assert "wall s" in md  # per-epoch wall-time column
    assert (tmp_path / "docs" / "quality_curves.png").exists()


def test_mono_wire_seed_labeled_and_restorable(tmp_path):
    """A `_mono` run dir (DEEPCORO_QR_MONO) gets a '(mono wire)' label, the
    report carries the exactness note, and the variance-row restore path
    accepts the composite seed key."""
    from dev._quality_report import write_report
    from dev.restore_quality_artifacts import restore

    (tmp_path / "docs").mkdir()
    _write_seed(tmp_path, 0, 25, 0.30)
    _write_seed(tmp_path, "2_mono", 25, 0.28)
    write_report(tmp_path, 6000, 1024, 16, 128)

    md = (tmp_path / "QUALITY.md").read_text()
    assert "| 2 (mono wire) | 25 |" in md
    assert "**Mono-wire read:**" in md
    assert "2_mono" not in md  # raw dir key never leaks into the report

    import shutil
    # force the variance-row parse path (this test pins the composite-key
    # labeling round-trip, not the verbatim-copy shortcut)
    shutil.rmtree(tmp_path / "docs" / "quality_artifacts")
    out = tmp_path / "restored"
    restore("2_mono", md_path=tmp_path / "QUALITY.md", out_root=out)
    got = json.loads(
        (out / ".quality_run_v2_s2_mono" / "artifacts" / "train.json")
        .read_text())
    assert got["history"][-1]["val_Recall@1"] == 0.28


def test_report_publishes_artifacts_and_restore_is_verbatim(tmp_path):
    """write_report copies each run's artifact JSONs into
    docs/quality_artifacts/s<key>/ (committed, so a VM reset can't lose
    them) and restore() prefers those over the lossy QUALITY.md parse."""
    from dev._quality_report import write_report
    from dev.restore_quality_artifacts import restore

    (tmp_path / "docs").mkdir()
    _write_seed(tmp_path, 0, 25, 0.30)
    _write_seed(tmp_path, "2_mono", 25, 0.28)
    write_report(tmp_path, 6000, 1024, 16, 128)

    pub = tmp_path / "docs" / "quality_artifacts"
    assert (pub / "s0" / "train.json").exists()
    assert (pub / "s2_mono" / "train.json").exists()

    out = tmp_path / "restored"
    restore(0, md_path=tmp_path / "QUALITY.md", out_root=out)
    got = (out / ".quality_run_v2_s0" / "artifacts" / "train.json").read_text()
    want = (tmp_path / ".quality_run_v2_s0" / "artifacts"
            / "train.json").read_text()
    assert got == want  # byte-identical, not a table re-parse


def test_restore_artifacts_round_trips_the_report(tmp_path):
    """dev/restore_quality_artifacts.py inverts write_report: a session that
    lost the gitignored run dirs (VM reset) can rebuild the primary seed's
    artifact JSONs from the committed QUALITY.md."""
    from dev._quality_report import write_report
    from dev.restore_quality_artifacts import restore

    import shutil

    (tmp_path / "docs").mkdir()
    _write_seed(tmp_path, 0, 25, 0.30)
    write_report(tmp_path, 6000, 1024, 16, 128)
    # drop the published verbatim copies so this test exercises the
    # markdown-parse fallback (the pre-publishing recovery path)
    shutil.rmtree(tmp_path / "docs" / "quality_artifacts")

    out = tmp_path / "restored"
    restore(0, md_path=tmp_path / "QUALITY.md", out_root=out)
    art = out / ".quality_run_v2_s0" / "artifacts"
    got = json.loads((art / "train.json").read_text())
    want = json.loads(
        (tmp_path / ".quality_run_v2_s0" / "artifacts" / "train.json")
        .read_text())
    assert len(got["history"]) == len(want["history"])
    for g, w in zip(got["history"], want["history"]):
        for k in ("val_Recall@1", "val_Recall@5", "val_MedianRank"):
            assert abs(g[k] - w[k]) < 5e-4  # table rounds to 3 decimals
        assert abs(g["loss"] - w["loss"]) < 5e-5
    assert got["config"]["tokenizer"] == "WordPieceTokenizer"
    tiers = json.loads((art / "tiers.json").read_text())
    assert tiers["3-findings-ood"]["Recall@1"] == 0.1
    scaling = json.loads((art / "scaling.json").read_text())
    assert scaling["recipe_B16_lr0.0001"]["escaped_plateau"] is True
    assert scaling["B16_lr0.0001"]["escaped_plateau"] is False
