#!/usr/bin/env python3
"""Quickstart: embed videos + reports and rank retrieval (runnable, CPU).

The minimal end-to-end path a new user touches first: build the towers
from a config, tokenize reports, embed both modalities, and rank
video->report retrieval by cosine similarity. Mirrors what
``--run_mode inference`` does at scale (runners/contrastive.py).

    python examples/quickstart_retrieval.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from deepcoro_clip_tpu.data.tokenizer import get_tokenizer
    from deepcoro_clip_tpu.flagship import tiny_config
    from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config
    from deepcoro_clip_tpu.models.video_encoder import (
        video_encoder_from_config,
    )
    from deepcoro_clip_tpu.registry import register_all

    register_all()
    cfg = tiny_config(batch_size=2, multi_video=False, num_videos=1)

    video_model = video_encoder_from_config(cfg)
    text_model = text_encoder_from_config(cfg)

    r = np.random.default_rng(0)
    videos = jnp.asarray(
        r.normal(size=(2, 1, cfg.frames, cfg.resize, cfg.resize, 3)),
        jnp.float32,
    )
    reports = [
        "the proximal lad shows 80 % narrowing .",
        "no significant coronary disease .",
    ]
    tok = get_tokenizer(vocab_size=cfg.text_vocab_size,
                        max_length=cfg.max_text_length)
    enc = tok(reports, max_length=cfg.max_text_length)

    rng = jax.random.PRNGKey(0)
    vv = video_model.init({"params": rng, "dropout": rng}, videos)
    tv = text_model.init({"params": rng, "dropout": rng},
                         jnp.asarray(enc["input_ids"]),
                         attention_mask=jnp.asarray(enc["attention_mask"]))

    v_emb = video_model.apply(vv, videos, deterministic=True)
    t_emb = text_model.apply(tv, jnp.asarray(enc["input_ids"]),
                             attention_mask=jnp.asarray(enc["attention_mask"]),
                             deterministic=True)

    def norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    sims = norm(v_emb) @ norm(t_emb).T
    print(f"video embeddings {v_emb.shape}, text embeddings {t_emb.shape}")
    print("cosine similarity matrix (videos x reports):")
    print(np.asarray(sims).round(3))
    ranks = np.argsort(-np.asarray(sims), axis=1)
    for i, rk in enumerate(ranks):
        print(f"video {i}: best report = {rk[0]} ({reports[rk[0]][:40]!r})")
    print("\nOK (untrained weights -- similarities are arbitrary; training "
          "aligns the diagonal: see dev/quality_run.py)")


if __name__ == "__main__":
    main()
