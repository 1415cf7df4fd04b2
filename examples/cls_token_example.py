#!/usr/bin/env python3
"""CLS-token pooling in multi-instance linear probing (runnable example).

JAX counterpart of the reference's examples/cls_token_example.py: build a
MultiInstanceLinearProbing model with cls_token pooling over a variable-
length bag of per-video embeddings, run it on CPU, and compare the pooling
modes. Run from the repo root:

    python examples/cls_token_example.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    # tiny example: run on CPU even when a TPU plugin is registered
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from deepcoro_clip_tpu.models.mil import MultiInstanceLinearProbing

    batch, n_videos, dim = 3, 5, 256
    head_structure = {
        "contrast_agent": 2,   # binary classification
        "main_structure": 5,   # multi-class classification
        "stent_presence": 1,   # regression
    }

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, n_videos, dim)), jnp.float32)
    # variable-length studies: mask out the padded instances
    mask = np.ones((batch, n_videos), bool)
    mask[1, 4:] = False   # second study has 4 videos
    mask[2, 3:] = False   # third study has 3 videos
    mask = jnp.asarray(mask)

    print(f"input {x.shape}, mask {np.asarray(mask).sum(1)} real videos")

    for mode in ("cls_token", "attention", "mean"):
        model = MultiInstanceLinearProbing(
            embedding_dim=dim, head_structure=head_structure,
            pooling_mode=mode, dropout=0.1,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, mask=mask,
        )
        out = model.apply(variables, x, mask=mask, deterministic=True)
        print(f"\npooling_mode={mode!r}")
        for head, n in head_structure.items():
            print(f"  {head}: {out[head].shape}  (expected ({batch}, {n}))")
            assert out[head].shape == (batch, n)

    # masking matters: dropping a video must not change other studies'
    # outputs, and must change the masked study's pooled embedding
    model = MultiInstanceLinearProbing(
        embedding_dim=dim, head_structure=head_structure,
        pooling_mode="cls_token",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, mask=mask,
    )
    full = model.apply(variables, x, mask=jnp.ones_like(mask),
                       deterministic=True)
    part = model.apply(variables, x, mask=mask, deterministic=True)
    d_masked = float(jnp.abs(full["contrast_agent"][1]
                             - part["contrast_agent"][1]).max())
    d_same = float(jnp.abs(full["contrast_agent"][0]
                           - part["contrast_agent"][0]).max())
    print(f"\nmask sensitivity: masked study delta {d_masked:.4f} "
          f"(>0), unmasked study delta {d_same:.1e} (==0)")
    assert d_masked > 0 and d_same == 0.0
    print("\nOK")


if __name__ == "__main__":
    main()
