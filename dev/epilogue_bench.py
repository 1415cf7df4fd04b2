"""Dot-epilogue fusion A/B on the text tower (round-3 profile follow-up).

The post-packed step profile attributes the largest remaining matmul mass
to BERT layer-output dot fusions running at 73-80 TF/s: XLA fuses the
residual-add / fp32-LayerNorm-stats / exact-erf-GELU epilogues into the
producing dots' output fusions (docs/KERNELS.md "Remaining profile mass").
``DEEPCORO_EPILOGUE_BARRIER=1`` (models/layers.py::epilogue_barrier)
splits those epilogues into separate loop fusions via
``lax.optimization_barrier`` so the dots keep the MXU to themselves, at
the price of materializing the dot outputs to HBM.

This measures the FULL text tower f+b (B=16, L=512, flagship 6xDh=128
geometry, dropout ACTIVE like the real train step) with the barrier off
vs on, in one process (the knob is read at trace time, so flipping the
env between jit builds works).

Usage: python dev/epilogue_bench.py  (TPU)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

ITERS = 30
B, L = 16, 512


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


def bench(barrier: bool):
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config

    os.environ["DEEPCORO_EPILOGUE_BARRIER"] = "1" if barrier else "0"
    cfg = flagship_config(max_text_length=L)
    model = text_encoder_from_config(cfg)
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, 30522, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, ids,
                        attention_mask=mask)
    drop_key = jax.random.PRNGKey(2)

    def loss(p):
        out = model.apply(p, ids, attention_mask=mask, deterministic=False,
                          rngs={"dropout": drop_key})
        return out.astype(jnp.float32).sum()

    def step(p):
        _, g = jax.value_and_grad(loss)(p)
        return jax.tree_util.tree_map(
            lambda a, b: a - 1e-7 * b.astype(a.dtype), p, g)

    dt, compile_s = _scan_time(step, params)
    print(f"tower f+b barrier={barrier}: {dt*1e3:.2f} ms "
          f"(compile {compile_s:.0f} s)", flush=True)
    return dt


if __name__ == "__main__":
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    off = bench(False)
    on = bench(True)
    d = (off - on) * 1e3
    print(f"\nepilogue barrier saving: {d:+.2f} ms f+b "
          f"({100 * d / (off * 1e3):+.1f}% of the tower)")
    print("flagship honest step is ~89.7 ms at B=16 -> step-level impact "
          f"~{100 * d / 89.7:+.1f}% (text tower only; video blocks extra)")
