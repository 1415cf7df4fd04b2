"""Online-serving throughput/latency benchmark for scripts/serve.py.

Measures the full HTTP path — request threads do host preprocessing
(decode/sample/resize + space-to-depth), the micro-batcher coalesces
concurrent studies into fixed-shape device dispatches — under a closed-loop
load of ``--concurrency`` clients. This quantifies what the batcher buys:
per-dispatch latency is amortized across coalesced studies, so throughput
scales with occupancy while single-request latency stays near the
bench_inference.py p50.

Usage: python scripts/bench_serving.py [--requests 64] [--concurrency 8]
           [--num_videos 10] [--max_batch 4] [--tiny]

Prints ONE JSON line:
  {"metric": "serving_studies_per_sec", "value": ..., "p50_ms": ...,
   "p95_ms": ..., "avg_occupancy": ..., "dispatches": ...}
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--num_videos", type=int, default=10)
    ap.add_argument("--clips_per_study", type=int, default=None,
                    help="clips in each request (default: num_videos)")
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--batch_window_ms", type=float, default=10.0)
    ap.add_argument("--bank", type=int, default=30000)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)

    import serve

    ns = type("A", (), {})()
    ns.base_config = None
    ns.checkpoint = None
    ns.ckpt_name = "checkpoint"
    ns.text_bank = None
    ns.demo_bank = args.bank
    ns.host = "127.0.0.1"
    ns.port = 0
    ns.max_batch = args.max_batch
    ns.batch_window_ms = args.batch_window_ms
    ns.num_videos = args.num_videos
    ns.top_k = 5
    ns.tiny = args.tiny
    httpd, engine = serve.build_server(ns)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]

    # study sources on disk: raw 512px clips, like bench_inference's host leg
    n_clips = args.clips_per_study or args.num_videos
    src = 64 if args.tiny else 512
    frames = 20 if args.tiny else 60
    r = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="serve_bench_"))
    paths = []
    for i in range(n_clips):
        p = tmp / f"clip{i}.npy"
        np.save(p, r.integers(0, 255, size=(frames, src, src, 3))
                .astype(np.uint8))
        paths.append(str(p))
    payload = json.dumps({"videos": paths})

    def one_request() -> float:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        t0 = time.perf_counter()
        c.request("POST", "/retrieve", payload,
                  {"Content-Type": "application/json"})
        resp = c.getresponse()
        body = json.loads(resp.read())
        if resp.status != 200:
            raise RuntimeError(body)
        return time.perf_counter() - t0

    one_request()  # compile warm (one padded dispatch)

    lat: list[float] = []
    lock = threading.Lock()
    it = iter(range(args.requests))

    def worker() -> None:
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                return
            dt = one_request()
            with lock:
                lat.append(dt)

    b0 = dict(httpd.batcher.stats)
    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(args.concurrency)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    s = httpd.batcher.stats
    dispatches = s["batches"] - b0["batches"]
    occ = (s["occupancy_sum"] - b0["occupancy_sum"]) / max(1, dispatches)
    la = np.array(sorted(lat)) * 1e3
    print(json.dumps({
        "metric": "serving_studies_per_sec",
        "value": round(args.requests / wall, 2),
        "unit": "studies/s",
        "p50_ms": round(float(np.percentile(la, 50)), 1),
        "p95_ms": round(float(np.percentile(la, 95)), 1),
        "avg_occupancy": round(occ, 2),
        "dispatches": dispatches,
        "concurrency": args.concurrency,
        "clips_per_study": n_clips,
        "max_batch": args.max_batch,
    }))
    httpd.shutdown()


if __name__ == "__main__":
    main()
