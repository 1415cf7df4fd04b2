"""Tiers-stage relay-stall survival (VERDICT r4 #7).

The axon relay's dead-connection failure mode makes device dispatches hang
forever instead of erroring (observed r4: the monolithic tiers stage
futex-waited 20 min at tier 2 and ``tiers.json`` was never written). The
stage now runs each tier in a timeout-bounded subprocess with kill+retry
and assembles ``tiers.json`` from per-tier partials. This test simulates a
stalled tier (subprocess timeout, no partial written) followed by a healthy
retry and checks the stage completes with every tier present.
"""

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_quality_run():
    spec = importlib.util.spec_from_file_location(
        "quality_run_under_test", REPO / "dev" / "quality_run.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tiers_stage_survives_stalled_tier(tmp_path, monkeypatch):
    qr = _load_quality_run()
    monkeypatch.setattr(qr, "ART", tmp_path / "artifacts")
    monkeypatch.setattr(qr, "STUDY", False)

    calls = {"n": 0, "stalled_once": False}

    def fake_run(cmd, cwd=None, timeout=None):
        calls["n"] += 1
        assert timeout is not None and timeout > 0, \
            "every tier subprocess must be timeout-bounded"
        tier = next(a for a in cmd if a.startswith("tier_one:")).split(":", 1)[1]
        # first attempt at the middle tier stalls: the subprocess is killed
        # by the timeout and leaves NO partial behind
        if tier == "2-findings" and not calls["stalled_once"]:
            calls["stalled_once"] = True
            raise subprocess.TimeoutExpired(cmd, timeout)
        (tmp_path / "artifacts").mkdir(parents=True, exist_ok=True)
        (tmp_path / "artifacts" / f"tier_{tier}.json").write_text(
            json.dumps({"Recall@1": 0.3, "tier": tier}))
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    qr.stage_tiers(timeout_s=5, retries=2)

    out = json.loads((tmp_path / "artifacts" / "tiers.json").read_text())
    assert set(out) == set(qr.TIER_NAMES), out
    # 3 tiers + 1 retry of the stalled one
    assert calls["n"] == 4 and calls["stalled_once"]


def test_tiers_stage_skips_measured_and_reports_missing(tmp_path, monkeypatch,
                                                        capsys):
    qr = _load_quality_run()
    art = tmp_path / "artifacts"
    art.mkdir(parents=True)
    monkeypatch.setattr(qr, "ART", art)
    monkeypatch.setattr(qr, "STUDY", False)
    # tier 1 already measured in a previous invocation
    (art / "tier_1-finding.json").write_text(json.dumps({"Recall@1": 0.25}))

    def always_stall(cmd, cwd=None, timeout=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", always_stall)
    qr.stage_tiers(timeout_s=5, retries=1)

    out = json.loads((art / "tiers.json").read_text())
    # the measured partial survives; unmeasured tiers reported missing
    assert list(out) == ["1-finding"]
    assert "INCOMPLETE" in capsys.readouterr().out


def test_run_chunk_watched_kills_stalled_process(tmp_path, monkeypatch):
    """A chunk whose metrics never advance past the stall window is
    killed (relay dead-connection mode) instead of eating the session."""
    import time

    qr = _load_quality_run()
    run_out = tmp_path
    # stale metrics file: one old line
    (run_out / "metrics.jsonl").write_text(
        json.dumps({"ts": time.time() - 10_000, "step": 1}) + "\n")

    t0 = time.time()
    rc = qr._run_chunk_watched([sys.executable, "-c",
                                "import time; time.sleep(9999)"],
                               run_out, stall_s=2, timeout_s=600)
    assert rc == "stall"
    assert time.time() - t0 < 180  # one 60s wait cycle + kill


def test_run_chunk_watched_passes_through_clean_exit(tmp_path):
    qr = _load_quality_run()
    (tmp_path / "metrics.jsonl").write_text("")
    rc = qr._run_chunk_watched([sys.executable, "-c", "print('ok')"],
                               tmp_path, stall_s=2, timeout_s=600)
    assert rc == 0
