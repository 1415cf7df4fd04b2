"""Fused output-projection A/B on both towers (round-5 scan-idle-gap fix).

DEEPCORO_FUSED_OUTPROJ=1 (models/layers.py::Attention) applies the
attention output projection inside the packed flash kernel's epilogue
(ops/flash_attention_packed.py::_fwd_proj_kernel) instead of a separate
XLA dot — one fewer fusion boundary per layer, targeting the ~11 ms/step
device idle between the scan body's 26 Pallas calls and their
surrounding fusions (docs/KERNELS.md "scan idle gap").

Measures BOTH towers f+b at flagship geometry with the knob off vs on in
one process (env is read at trace time), plus a compiled fwd parity
check on each. Tower-level first: the full-step bench A/B costs a fresh
~35 min remote compile, so it only runs if the towers show a gain
(``--full`` flag runs bench.py subprocesses with the knob set).

Usage: python dev/fused_outproj_bench.py [--full] (TPU)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

ITERS = 30
B = 16


def _scan_time(make_step, carry):
    import jax
    from jax import lax

    @jax.jit
    def run(c):
        return lax.scan(lambda c, _: (make_step(c), None), c, None,
                        length=ITERS)[0]

    t0 = time.perf_counter()
    jax.block_until_ready(run(carry))  # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(carry))
    return (time.perf_counter() - t0) / ITERS, compile_s


def bench_text(fused: bool):
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config

    os.environ["DEEPCORO_FUSED_OUTPROJ"] = "1" if fused else "0"
    L = 512
    cfg = flagship_config(max_text_length=L)
    model = text_encoder_from_config(cfg)
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, 30522, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, ids,
                        attention_mask=mask)
    out = jax.jit(lambda p: model.apply(p, ids, attention_mask=mask))(params)
    drop_key = jax.random.PRNGKey(2)

    def loss(p):
        o = model.apply(p, ids, attention_mask=mask, deterministic=False,
                        rngs={"dropout": drop_key})
        return o.astype(jnp.float32).sum()

    def step(p):
        _, g = jax.value_and_grad(loss)(p)
        return jax.tree_util.tree_map(
            lambda a, b: a - 1e-7 * b.astype(a.dtype), p, g)

    dt, compile_s = _scan_time(step, params)
    print(f"text tower f+b fused={fused}: {dt*1e3:.2f} ms "
          f"(compile {compile_s:.0f} s)", flush=True)
    return dt, np.asarray(out, np.float32)


def bench_video(fused: bool):
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.models.video_encoder import (
        video_encoder_from_config,
    )

    os.environ["DEEPCORO_FUSED_OUTPROJ"] = "1" if fused else "0"
    cfg = flagship_config()
    model = video_encoder_from_config(cfg)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(B, cfg.frames, cfg.resize, cfg.resize, 3)),
                    jnp.bfloat16)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x)
    out = jax.jit(lambda p: model.apply(p, x))(params)
    drop_key = jax.random.PRNGKey(2)

    def loss(p):
        o = model.apply(p, x, deterministic=False,
                        rngs={"dropout": drop_key})
        return o.astype(jnp.float32).sum()

    def step(p):
        _, g = jax.value_and_grad(loss)(p)
        return jax.tree_util.tree_map(
            lambda a, b: a - 1e-7 * b.astype(a.dtype), p, g)

    dt, compile_s = _scan_time(step, params)
    print(f"video tower f+b fused={fused}: {dt*1e3:.2f} ms "
          f"(compile {compile_s:.0f} s)", flush=True)
    return dt, np.asarray(out, np.float32)


def full_step_ab(n: int = 3):
    """bench.py subprocesses with the knob set (fresh compile when the
    fused program is cold)."""
    res = {}
    for fused in ("0", "1"):
        vals = []
        for i in range(n):
            env = dict(os.environ, DEEPCORO_FUSED_OUTPROJ=fused)
            r = subprocess.run([sys.executable, str(REPO / "bench.py")],
                               cwd=str(REPO), env=env, capture_output=True,
                               text=True, timeout=5400)
            for ln in reversed(r.stdout.splitlines()):
                if ln.strip().startswith("{") and '"metric"' in ln:
                    vals.append(json.loads(ln)["value"])
                    break
            print(f"fused={fused} run {i}: {vals[-1] if vals else 'FAIL'}",
                  flush=True)
        res[fused] = vals
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    if "--full" in sys.argv:
        full_step_ab()
        raise SystemExit(0)
    toff, out_t0 = bench_text(False)
    ton, out_t1 = bench_text(True)
    voff, out_v0 = bench_video(False)
    von, out_v1 = bench_video(True)
    for name, a, b in (("text", out_t0, out_t1), ("video", out_v0, out_v1)):
        diff = float(np.max(np.abs(a - b)))
        print(f"{name} compiled fwd agreement: max abs diff {diff:.3e} "
              f"(max |out| {float(np.max(np.abs(a))):.3e})")
    for name, off, on in (("text", toff, ton), ("video", voff, von)):
        d = (off - on) * 1e3
        print(f"{name} fused-outproj saving: {d:+.2f} ms f+b "
              f"({100 * d / (off * 1e3):+.1f}% of the tower)")
