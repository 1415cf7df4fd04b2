"""Relay H2D bandwidth probe (VERDICT r4 #1: the h2d-inclusive bench
number collapsed 7.68 -> 1.67 clips/s between the r3 and r4 driver runs).

The axon tunnel carries every host->device transfer; the flagship uint8
batch is ~46 MB/step, so the h2d-inclusive throughput is a direct
function of relay bandwidth, not of the compiled program. This probe
times device_put of a flagship-sized uint8 batch N times and prints
MB/s + the implied h2d-inclusive ceiling, so a degraded relay is
distinguishable from a code regression in seconds.

Usage: python dev/h2d_probe.py [n]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    # flagship uint8 patch-major batch: B=16 x 16f x 224^2 x 3
    arr = np.random.default_rng(0).integers(
        0, 255, size=(16, 16, 224, 224, 3), dtype=np.uint8)
    mb = arr.nbytes / 1e6
    jax.device_put(np.ones((8, 8), np.float32)).block_until_ready()  # warm
    rates = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.device_put(arr).block_until_ready()
        dt = time.perf_counter() - t0
        rates.append(mb / dt)
        print(f"put {i}: {mb:.0f} MB in {dt:.2f} s = {mb/dt:.1f} MB/s",
              flush=True)
    med = sorted(rates)[len(rates) // 2]
    out = {"mb_per_transfer": round(mb, 1), "n": n,
           "median_MBps": round(med, 1),
           "min_MBps": round(min(rates), 1),
           "max_MBps": round(max(rates), 1),
           "implied_h2d_clips_per_sec": round(16 / (mb / med), 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
