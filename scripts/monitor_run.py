"""Tail a run's metrics history (reference counterpart: monitor_run.sh).

Usage: python scripts/monitor_run.py <run_dir> [--follow]
"""

import argparse
import json
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--follow", action="store_true")
    ap.add_argument("--keys", default="train/loss,val/loss,val/Recall@1,lr")
    args = ap.parse_args()
    keys = [k.strip() for k in args.keys.split(",")]
    path = Path(args.run_dir) / "metrics.jsonl"
    pos = 0
    while True:
        if path.exists():
            with open(path) as f:
                f.seek(pos)
                for line in f:
                    rec = json.loads(line)
                    shown = {k: rec[k] for k in keys if k in rec}
                    if shown:
                        print(f"step {rec.get('step')}: "
                              + "  ".join(f"{k}={v:.4g}" if isinstance(v, float)
                                          else f"{k}={v}" for k, v in shown.items()))
                pos = f.tell()
        if not args.follow:
            break
        time.sleep(5)


if __name__ == "__main__":
    main()
