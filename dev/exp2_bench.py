"""exp2-softmax A/B on the text tower (round-3 kernel follow-up).

DEEPCORO_EXP2_SOFTMAX=1 (ops/flash_attention.py::softmax_base) folds
log2e into the score scale so the softmax exp pass is a bare sub+exp2 —
one fewer full-score-matrix VPU multiply in fwd and bwd of both kernels.
The text attention at L=512 is softmax/VPU-bound (docs/KERNELS.md), so
this is where the fold should show.

Measures the FULL text tower f+b (B=16, L=512, flagship 6xDh=128,
dropout active) with the fold off vs on, one process (env is read at
trace time). Also prints a compiled-parity check between the two paths.

Usage: python dev/exp2_bench.py  (TPU)
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


def bench(exp2: bool):
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config

    os.environ["DEEPCORO_EXP2_SOFTMAX"] = "1" if exp2 else "0"
    cfg = flagship_config(max_text_length=L)
    model = text_encoder_from_config(cfg)
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, 30522, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, ids,
                        attention_mask=mask)
    drop_key = jax.random.PRNGKey(2)

    # compiled numerics check: deterministic fwd, both paths
    out = jax.jit(lambda p: model.apply(p, ids, attention_mask=mask))(params)
    out = np.asarray(out, np.float32)

    def loss(p):
        o = model.apply(p, ids, attention_mask=mask, deterministic=False,
                        rngs={"dropout": drop_key})
        return o.astype(jnp.float32).sum()

    def step(p):
        _, g = jax.value_and_grad(loss)(p)
        return jax.tree_util.tree_map(
            lambda a, b: a - 1e-7 * b.astype(a.dtype), p, g)

    dt, compile_s = _scan_time(step, params)
    print(f"tower f+b exp2={exp2}: {dt*1e3:.2f} ms "
          f"(compile {compile_s:.0f} s)", flush=True)
    return dt, out


if __name__ == "__main__":
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    off, out0 = bench(False)
    on, out1 = bench(True)
    diff = float(np.max(np.abs(out0 - out1)))
    denom = float(np.max(np.abs(out0)))
    print(f"\ncompiled fwd agreement: max abs diff {diff:.3e} "
          f"(max |out| {denom:.3e})")
    d = (off - on) * 1e3
    print(f"exp2 fold saving: {d:+.2f} ms f+b ({100 * d / (off * 1e3):+.1f}% "
          "of the tower)")
