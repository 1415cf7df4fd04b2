"""Bench run-to-run variance (VERDICT r3 weak #3 / next-step #4).

Runs `python bench.py` N times in fresh subprocesses (same conditions the
driver uses), parses the one-line JSON each run prints, and reports
mean/sd/min/max clips-per-second plus the implied noise band. Resolves the
174.2-vs-165.4 ledger question: whether the spread between recorded runs is
real improvement or tunnel-noise underestimation.

Usage: python dev/bench_variance.py [N] [--batch B]
Writes dev/bench_variance.json and prints a summary line.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=6)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    runs = []
    for i in range(args.n):
        cmd = [sys.executable, str(REPO / "bench.py")]
        if args.batch:
            cmd.append(str(args.batch))
        t0 = time.perf_counter()
        r = subprocess.run(cmd, cwd=str(REPO), capture_output=True,
                           text=True, timeout=3600)
        wall = time.perf_counter() - t0
        line = None
        for ln in reversed(r.stdout.splitlines()):
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                line = json.loads(ln)
                break
        if line is None:
            print(f"run {i}: no JSON line (rc={r.returncode})\n{r.stdout[-500:]}"
                  f"\n{r.stderr[-500:]}")
            continue
        runs.append({"value": line["value"], "unit": line.get("unit"),
                     "wall_s": round(wall, 1),
                     # keep the full record: the h2d-inclusive number is
                     # the relay-health diagnostic (VERDICT r4 #1 collapse)
                     "record": line})
        print(f"run {i}: {line['value']:.2f} {line.get('unit')} "
              f"({wall:.0f}s)", flush=True)

    if not runs:
        raise SystemExit("no successful runs")
    vals = [r["value"] for r in runs]
    n = len(vals)
    mean = sum(vals) / n
    sd = (sum((v - mean) ** 2 for v in vals) / max(n - 1, 1)) ** 0.5
    out = {
        "n": n, "mean": round(mean, 2), "sd": round(sd, 3),
        "min": min(vals), "max": max(vals),
        "rel_sd_pct": round(100 * sd / mean, 2),
        "spread_pct": round(100 * (max(vals) - min(vals)) / mean, 2),
        "runs": runs,
    }
    (REPO / "dev" / "bench_variance.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
