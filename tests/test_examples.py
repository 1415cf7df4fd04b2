"""The examples/ walkthroughs must stay runnable (reference keeps a
runnable examples/ dir; ours are CPU-safe by construction)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.parametrize("script", [
    "examples/cls_token_example.py",
    "examples/quickstart_retrieval.py",
])
def test_example_runs(script):
    r = subprocess.run(
        [sys.executable, str(REPO / script)],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
