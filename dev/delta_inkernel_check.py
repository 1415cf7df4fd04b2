"""On-chip parity check for the delta-in-kernel backward (both kernels).

The bwd kernels now derive delta = rowsum(do * out) from the out residual
inside the kernel instead of streaming a host-computed [.., Lq, 1] fp32
operand (whose 1-lane-minor layout materialization profiled at 3.4 GiB/s).
Interpret-mode tests pass; this re-verifies the compiled TPU lowering
(Pallas enforces block rules interpret mode does not) at flagship-like
shapes: video rope L=1568/392 and masked text L=512.

Usage: python dev/delta_inkernel_check.py  (TPU)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

setup_tpu_defaults()

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.ops import build_rope3d_tables
from deepcoro_clip_tpu.ops.flash_attention import flash_attention
from deepcoro_clip_tpu.ops.flash_attention_packed import flash_attention_packed


def _grads(fn, *args):
    def loss(*a):
        return (fn(*a).astype(jnp.float32) ** 2).sum()

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args)


def _cmp(name, got, want, tol):
    worst = 0.0
    for g, w in zip(got, want):
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        d = float(np.max(np.abs(g - w)) / (np.max(np.abs(w)) + 1e-9))
        worst = max(worst, d)
    status = "OK " if worst <= tol else "FAIL"
    print(f"{status} {name}: worst rel grad diff {worst:.3e} (tol {tol})",
          flush=True)
    return worst <= tol


def main():
    r = np.random.default_rng(0)
    ok = True

    # video-like: rope, no mask, L = 8*14*14 (flagship pre-pool)
    for L, grid in ((1568, (8, 14, 14)), (392, (2, 14, 14))):
        B, H, Dh = 4, 4, 128
        q, k, v = (jnp.asarray(r.normal(size=(B, H, L, Dh)) * 0.3,
                               jnp.bfloat16) for _ in range(3))
        tabs = build_rope3d_tables(Dh, *grid)
        sin, cos = jnp.asarray(tabs.sin), jnp.asarray(tabs.cos)
        f_p = lambda a, b, c: flash_attention(a, b, c, sin=sin, cos=cos,
                                              backend="pallas")
        f_x = lambda a, b, c: flash_attention(a, b, c, sin=sin, cos=cos,
                                              backend="xla")
        ok &= _cmp(f"standard rope L={L}", _grads(f_p, q, k, v),
                   _grads(f_x, q, k, v), 3e-2)

        qp, kp, vp = (t.transpose(0, 2, 1, 3).reshape(B, L, H * Dh)
                      for t in (q, k, v))
        g_p = lambda a, b, c: flash_attention_packed(
            a, b, c, num_heads=H, sin=sin, cos=cos, backend="pallas")
        g_x = lambda a, b, c: flash_attention_packed(
            a, b, c, num_heads=H, sin=sin, cos=cos, backend="xla")
        ok &= _cmp(f"packed rope L={L}", _grads(g_p, qp, kp, vp),
                   _grads(g_x, qp, kp, vp), 3e-2)

    # text-like: key-padding mask, L=512
    B, H, L, Dh = 4, 6, 512, 128
    q, k, v = (jnp.asarray(r.normal(size=(B, H, L, Dh)) * 0.3, jnp.bfloat16)
               for _ in range(3))
    mask = jnp.asarray((np.arange(L)[None, :] < r.integers(
        64, L, size=(B, 1))).astype(np.int32))
    f_p = lambda a, b, c: flash_attention(a, b, c, kv_mask=mask,
                                          backend="pallas")
    f_x = lambda a, b, c: flash_attention(a, b, c, kv_mask=mask,
                                          backend="xla")
    ok &= _cmp("standard mask L=512", _grads(f_p, q, k, v),
               _grads(f_x, q, k, v), 3e-2)

    qp, kp, vp = (t.transpose(0, 2, 1, 3).reshape(B, L, H * Dh)
                  for t in (q, k, v))
    g_p = lambda a, b, c: flash_attention_packed(
        a, b, c, num_heads=H, kv_mask=mask, backend="pallas")
    g_x = lambda a, b, c: flash_attention_packed(
        a, b, c, num_heads=H, kv_mask=mask, backend="xla")
    ok &= _cmp("packed mask L=512", _grads(g_p, qp, kp, vp),
               _grads(g_x, qp, kp, vp), 3e-2)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
