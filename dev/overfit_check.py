"""Full-scale sanity: the flagship model must overfit one fixed batch.

Run on TPU. Catches silent learning-path breakage (dead gradients, wrong
masking, optimizer wiring) that shape tests can't see, at the real model
size. Expected: loss ~ln(B) at step 0, < 1e-2 by ~step 150 at lr 1e-4.

CAUTION: lr 1e-3 (10x the flagship recipe) drives from-scratch contrastive
training at this scale into the uniform-logits attractor (loss pinned at
exactly ln(B), gradients decaying to zero) — measured on chip, 400 steps,
no escape. The default 1e-4 + warmup recipe converges cleanly. Keep this in
mind when sweeping lr upward.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from deepcoro_clip_tpu.flagship import flagship_config
from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
from deepcoro_clip_tpu.registry import register_all
from deepcoro_clip_tpu.train.clip import build_clip_bundle, make_train_step
from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults


def main(batch=16, steps=200, lr=1e-4):
    setup_tpu_defaults()
    register_all()
    cfg = flagship_config(batch_size=batch, max_text_length=512, lr=lr,
                          scheduler_name="cosine", dropout=0.0)
    mesh = make_mesh(MeshSpec(data=1, model=1))
    bundle, state = build_clip_bundle(
        cfg, mesh, jax.random.PRNGKey(0), steps_per_epoch=100
    )
    step = make_train_step(bundle)
    r = np.random.default_rng(0)
    b = bundle.batch_sharding_fn({
        "videos": r.normal(size=(batch, 1, cfg.frames, cfg.resize,
                                 cfg.resize, 3)).astype(np.float32),
        "video_mask": np.ones((batch, 1), bool),
        "input_ids": r.integers(0, 30522, (batch, 512)).astype(np.int32),
        "attention_mask": np.ones((batch, 512), np.int32),
    })
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, m = step(state, b, sub, 0.0, 0.0, -1.0)
        losses.append(float(m["loss"]))
        if i % 10 == 0:
            print(f"step {i}: loss {losses[-1]:.4f}")
    ok = all(np.isfinite(losses)) and losses[-1] < losses[0] * 0.2
    print(f"first {losses[0]:.3f} last {losses[-1]:.3f} -> "
          f"{'OK' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*[int(float(a)) if float(a) >= 1 else float(a)
                    for a in sys.argv[1:]]))
