"""Batch-size invariance parity harness.

Reference: scripts/run_reproducibility_tests.py:21-250 — run inference at
batch sizes {1, 2, 4, 12} on a study sample and require predictions to match
the full-batch run. XLA note (SURVEY.md §7): our eval path uses exact (not
online-rescaled) softmax and fp32 statistics precisely so this invariance
holds on TPU.

Usage:
    python scripts/run_reproducibility_tests.py --base_config <cfg.yaml> \
        [--batch_sizes 1,2,4,12] [--tolerance 1e-3]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def embeddings_at_batch_size(cfg_path: str, batch_size: int, overrides):
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.contrastive import VideoContrastiveLearningRunner

    register_all()
    cfg = parse_config(
        ["--base_config", cfg_path, "--batch_size", str(batch_size)]
        + overrides
    )
    runner = VideoContrastiveLearningRunner(cfg)
    split = cfg.run_mode if cfg.run_mode in runner.loaders else "val"
    loader = runner.loaders[split]
    embs, keys = [], []
    for batch in loader:
        n_real = len(batch["paths"])
        db = runner.bundle.batch_sharding_fn(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        )
        out = runner.eval_step(runner.state.params, db)
        embs.append(np.asarray(out["video_emb"], np.float32)[:n_real])
        keys.extend(p[0] for p in batch["paths"])
    emb = np.concatenate(embs)
    order = np.argsort(keys)
    return np.asarray(keys)[order], emb[order]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_config", required=True)
    ap.add_argument("--batch_sizes", default="1,2,4,12")
    ap.add_argument("--tolerance", type=float, default=1e-3)
    args, rest = ap.parse_known_args()

    sizes = [int(s) for s in args.batch_sizes.split(",")]
    ref_keys, ref_emb = embeddings_at_batch_size(
        args.base_config, max(sizes), rest
    )
    print(f"reference batch size {max(sizes)}: {len(ref_keys)} videos")
    ok = True
    for bs in sizes:
        keys, emb = embeddings_at_batch_size(args.base_config, bs, rest)
        if not np.array_equal(keys, ref_keys):
            print(f"batch_size={bs}: SAMPLE SET MISMATCH")
            ok = False
            continue
        diff = float(np.max(np.abs(emb - ref_emb)))
        status = "OK" if diff <= args.tolerance else "FAIL"
        if diff > args.tolerance:
            ok = False
        print(f"batch_size={bs}: max |Δembedding| = {diff:.2e}  [{status}]")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
