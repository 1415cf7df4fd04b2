"""Bulk embedding generation: text bank and/or video embeddings.

Reference counterparts: utils/generate_text_embeddings.py,
utils/generate_video_embeddings.py, extract_pci_embeddings.py — encode a CSV
of reports into a text-embedding bank (.npz) consumed by the retrieval
inference pipeline (runners/contrastive.py inference()), and/or encode videos
into study embeddings.

Usage:
    python scripts/generate_embeddings.py --base_config cfg.yaml \
        --checkpoint <ckpt_dir> --texts_csv reports.csv --text_column Report \
        --out text_bank.npz
    python scripts/generate_embeddings.py --base_config cfg.yaml \
        --checkpoint <ckpt_dir> --videos --out video_embeddings.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_config", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoints dir of a CLIP run (restores 'checkpoint')")
    ap.add_argument("--texts_csv", default=None)
    ap.add_argument("--text_column", default="Report")
    ap.add_argument("--videos", action="store_true")
    ap.add_argument("--out", required=True)
    args, rest = ap.parse_known_args()

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.contrastive import VideoContrastiveLearningRunner
    from deepcoro_clip_tpu.train.checkpoint import CheckpointManager

    register_all()
    cfg = parse_config(["--base_config", args.base_config] + rest)
    runner = VideoContrastiveLearningRunner(cfg)
    if args.checkpoint:
        runner.ckpt = CheckpointManager(args.checkpoint)
        runner.state = runner.ckpt.restore(runner.state, "checkpoint")

    out: dict = {}
    if args.texts_csv:
        df = pd.read_csv(args.texts_csv)
        texts = df[args.text_column].astype(str).tolist()
        uniq = list(dict.fromkeys(texts))
        emb = runner._encode_texts(uniq)
        out["text_embeddings"] = emb
        out["texts"] = np.asarray(uniq)
        print(f"encoded {len(uniq)} unique texts -> {emb.shape}")
    if args.videos:
        split = cfg.run_mode if cfg.run_mode in runner.loaders else "val"
        loader = runner.loaders[split]
        embs, paths = [], []
        for batch in loader:
            n_real = len(batch["paths"])
            db = runner.bundle.batch_sharding_fn(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            o = runner.eval_step(runner.state.params, db)
            embs.append(np.asarray(o["video_emb"], np.float32)[:n_real])
            paths.extend(p[0] for p in batch["paths"])
        out["video_embeddings"] = np.concatenate(embs)
        out["paths"] = np.asarray(paths)
        print(f"encoded {len(paths)} videos")
    np.savez(args.out, **out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
