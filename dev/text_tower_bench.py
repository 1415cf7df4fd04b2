"""Text-tower Dh=64 padding-bound measurement (VERDICT round-2 #3).

Measures, on the real chip (scan-fused timing — per-dispatch tunnel latency
is ~100 ms on this machine, see CLAUDE.md):
  1. text attention kernel f+b at the flagship shape (B=16, H=12, L=512,
     Dh=64) — the padded-lane configuration;
  2. the same total width as H=6, Dh=128 — the MXU-native configuration;
  3. the FULL text tower fwd+bwd in both geometries.

Context: text attention is ~0.46 TF of the 9.34 TF honest step (~5% of
FLOPs) — the tower's other 4.1 TF (QKVO projections + FFN) contract over
768/3072 and already run at full lane width. docs/KERNELS.md records the
conclusion.

Usage: python dev/text_tower_bench.py  (TPU)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

ITERS = 30


def _scan_time(make_step, carry):
    """Seconds per step of a jitted lax.scan over ``make_step`` (the carry
    feeds back so XLA cannot elide iterations)."""
    import jax
    from jax import lax

    @jax.jit
    def run(c):
        return lax.scan(lambda c, _: (make_step(c), None), c, None,
                        length=ITERS)[0]

    out = run(carry)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(carry))
    return (time.perf_counter() - t0) / ITERS


def bench_attention(B=16, L=512):
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.ops.flash_attention import flash_attention

    results = {}
    r = np.random.default_rng(0)
    for H, Dh in ((12, 64), (6, 128)):
        q, k, v = (jnp.asarray(
            r.normal(size=(B, H, L, Dh)).astype(np.float32) * 0.3
        ).astype(jnp.bfloat16) for _ in range(3))

        def loss(q):
            return flash_attention(q, k, v, backend="pallas").astype(
                jnp.float32).sum()

        def step(q):
            _, g = jax.value_and_grad(loss)(q)
            return q + 1e-6 * g.astype(q.dtype)

        dt = _scan_time(step, q)
        flops = 3.5 * 4 * B * H * L * L * Dh  # useful f+b attention FLOPs
        results[f"H{H}xDh{Dh}"] = {"ms": dt * 1e3,
                                   "tflops_s": flops / dt / 1e12}
        print(f"attention H={H} Dh={Dh}: {dt*1e3:.2f} ms f+b "
              f"({flops/dt/1e12:.1f} TF/s useful)", flush=True)
    return results


def bench_tower(B=16, L=512):
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config

    results = {}
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, 30522, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    for H, Dh in ((12, 64), (6, 128)):
        cfg = flagship_config(text_heads=H, max_text_length=L)
        model = text_encoder_from_config(cfg)
        params = model.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)}, ids,
                            attention_mask=mask)

        def loss(p):
            return model.apply(p, ids, attention_mask=mask,
                               deterministic=True).astype(jnp.float32).sum()

        def step(p):
            _, g = jax.value_and_grad(loss)(p)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-7 * b.astype(a.dtype), p, g)

        dt = _scan_time(step, params)
        results[f"tower_H{H}xDh{Dh}"] = {"ms": dt * 1e3}
        print(f"text tower H={H} Dh={Dh}: {dt*1e3:.2f} ms f+b", flush=True)
    return results


if __name__ == "__main__":
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    att = bench_attention()
    tow = bench_tower()
    a64, a128 = att["H12xDh64"]["ms"], att["H6xDh128"]["ms"]
    t64, t128 = tow["tower_H12xDh64"]["ms"], tow["tower_H6xDh128"]["ms"]
    print(f"\nattention saving at Dh=128: {a64 - a128:.2f} ms "
          f"({100 * (a64 - a128) / max(a64, 1e-9):.0f}% of the kernel)")
    print(f"tower saving at Dh=128: {t64 - t128:.2f} ms f+b")
    print("flagship honest step is ~111 ms at B=16 -> step-level impact "
          f"~{100 * (t64 - t128) / 111.0:.1f}%")
