"""Profile the flagship train step on TPU and print the op-level breakdown.

Captures an xprof trace of a few scan-fused steps, then parses the xplane
with tensorboard_plugin_profile to print top HLO ops by device self-time —
the data VERDICT round-1 #3 asked for (where do the 145-clips/s step's
milliseconds actually go).

Usage: python dev/profile_step.py [batch]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
TRACE_DIR = REPO / ".profiles" / "flagship_step"


def capture(batch: int) -> None:
    import jax

    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()

    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.train.clip import (
        build_clip_bundle,
        make_scan_train_steps,
        make_train_step,
    )

    register_all()
    cfg = flagship_config(batch_size=batch, max_text_length=512)
    mesh = make_mesh(MeshSpec(data=jax.device_count(), model=1))
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0),
                                      steps_per_epoch=100)
    step_fn = make_train_step(bundle)

    r = np.random.default_rng(0)
    videos = r.integers(0, 255, size=(batch, 1, cfg.frames, cfg.resize,
                                      cfg.resize, 3)).astype(np.uint8)
    # profile the same wire bench.py measures: patch-major uint8 by default
    # (DEEPCORO_PATCH_WIRE=0 opts back into the raw wire's device-side copy)
    if os.environ.get("DEEPCORO_PATCH_WIRE", "1") == "1":
        from deepcoro_clip_tpu.data.patch_wire import patchify_videos
        from deepcoro_clip_tpu.models.video_encoder import resolve_architecture

        videos = patchify_videos(videos, tuple(
            resolve_architecture(cfg)["vit_patch"]))
    host_batch = {
        "videos": videos,
        "video_mask": np.ones((batch, 1), bool),
        "input_ids": r.integers(0, cfg.text_vocab_size,
                                size=(batch, 512)).astype(np.int32),
        "attention_mask": np.ones((batch, 512), np.int32),
    }
    b = bundle.batch_sharding_fn(host_batch)
    state, m = step_fn(state, b, jax.random.PRNGKey(0), 0.0, 0.0, -1.0)
    jax.block_until_ready(m["loss"])

    scan_fn = make_scan_train_steps(bundle, n_steps=4)
    state, m = scan_fn(state, b, jax.random.PRNGKey(0))
    jax.block_until_ready(m["loss"])

    jax.profiler.start_trace(str(TRACE_DIR))
    state, m = scan_fn(state, b, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()


def _find_xplane() -> str:
    paths = sorted(glob.glob(str(TRACE_DIR / "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit("no xplane.pb captured")
    return paths[-1]


def report(n_steps: int = 4) -> None:
    """Aggregate device self-time by HLO op name from the trace."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplane = _find_xplane()
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["id"] for c in tbl["cols"]]
    idx = {k: cols.index(k) for k in (
        "category", "hlo_op_name", "hlo_op_expression", "occurrences",
        "total_self_time", "bound_by", "model_flop_rate",
        "measured_memory_bw", "tf_op_name",
    )}

    def val(row, key):
        v = row["c"][idx[key]]
        return v.get("v") if isinstance(v, dict) else v

    rows = tbl["rows"]
    total_us = sum(float(val(r, "total_self_time") or 0) for r in rows)

    by_cat = defaultdict(float)
    for r in rows:
        by_cat[val(r, "category")] += float(val(r, "total_self_time") or 0)
    print(f"== total device self time: {total_us/1e3:.2f} ms over {n_steps} "
          f"steps -> {total_us/1e3/n_steps:.2f} ms/step ==")
    print("\n== by HLO category ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us/1e3/n_steps:8.3f} ms/step  {100*us/total_us:5.1f}%  {cat}")

    def dump(rows_, n, title):
        print(f"\n== {title} ==")
        ranked = sorted(rows_,
                        key=lambda r: -float(val(r, "total_self_time") or 0))
        for r in ranked[:n]:
            us = float(val(r, "total_self_time") or 0)
            occ = int(float(val(r, "occurrences") or 0))
            name = (val(r, "tf_op_name") or val(r, "hlo_op_name") or "")[:110]
            gf = float(val(r, "model_flop_rate") or 0)
            bw = float(val(r, "measured_memory_bw") or 0)
            print(f"  {us/1e3/n_steps:8.3f} ms/step x{occ:4d} "
                  f"{100*us/total_us:5.1f}% {gf:9.0f} GF/s {bw:7.1f} GiB/s "
                  f"{val(r,'bound_by') or '':>8}  {name}")

    dump(rows, 40, "top 40 ops by self time")
    for cat in ("loop fusion", "data formatting", "copy-done", "pad",
                "custom-call"):
        dump([r for r in rows if val(r, "category") == cat], 12,
             f"top {cat}")


def gaps(n_steps: int = 4) -> None:
    """Device-timeline occupancy: span vs busy time of the TPU XLA-Ops lane
    and the largest holes. Distinguishes real device idle from dispatch
    latency outside the traced span (docs/KERNELS.md 'Delta-in-kernel':
    self-time parsing alone cannot)."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([_find_xplane()], "trace_viewer", {})
    if isinstance(data, bytes):
        data = data.decode()
    tr = json.loads(data)
    evs = tr["traceEvents"] if isinstance(tr, dict) else tr
    lanes = {(e.get("pid"), e.get("tid")): (e.get("args") or {}).get("name")
             for e in evs if e.get("ph") == "M"
             and e.get("name") == "thread_name"}
    ops = [e for e in evs if e.get("ph") == "X"
           and lanes.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    if not ops:
        print("no XLA Ops lane in trace")
        return
    ops.sort(key=lambda e: e["ts"])
    t0 = ops[0]["ts"]
    t1 = max(e["ts"] + e["dur"] for e in ops)
    span = t1 - t0
    holes, cur = [], t0
    for e in ops:  # events nest/overlap; walk the union of intervals
        if e["ts"] > cur:
            holes.append((e["ts"] - cur, e["name"]))
        cur = max(cur, e["ts"] + e["dur"])
    idle = sum(h for h, _ in holes)
    print(f"== device lane: span {span/1e3:.2f} ms "
          f"({span/1e3/n_steps:.2f} ms/step), holes {idle/1e3:.3f} ms "
          f"({100*idle/span:.2f}%) ==")
    for h, nm in sorted(holes, reverse=True)[:10]:
        if h < 10:
            break
        print(f"  {h/1e3:7.3f} ms hole before {nm[:90]}")


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(pos[0]) if pos else 16
    if "--report-only" not in sys.argv:
        capture(batch)
    report()
    if "--gaps" in sys.argv:
        gaps()
