"""Visualize SigLIP video/text samples from the manifests.

Reference counterpart: scripts/visualize_siglip_samples.py — sample a few
video ids from the videos/texts/edges manifests, extract representative
frames, and save a figure of middle frames captioned with a positive prompt
(debugging aid for SigLIP dataset builds).

Usage:
    python scripts/visualize_siglip_samples.py \
        --videos videos.csv --texts texts.csv --edges edges.csv \
        --num-samples 3 --frames-per-video 5 --output debug_frames
"""

from __future__ import annotations

import argparse
import sys
import textwrap
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def load_frames(path: str, n_frames: int) -> np.ndarray:
    """Middle ``n_frames`` of the clip via the repo's video loader."""
    from deepcoro_clip_tpu.data.video_io import load_video

    clip = load_video(path, n_frames=max(n_frames * 2, 8), resize=224,
                      output_dtype="uint8")
    idx = np.linspace(len(clip) // 4, 3 * len(clip) // 4 - 1, n_frames)
    return clip[idx.astype(int)]


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    from deepcoro_clip_tpu.data.csv_utils import read_csv_with_fallback
    from deepcoro_clip_tpu.data.siglip import SiglipResources

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--videos", required=True)
    ap.add_argument("--texts", required=True)
    ap.add_argument("--edges", required=True)
    ap.add_argument("--video-ids", nargs="*", default=None)
    ap.add_argument("--num-samples", type=int, default=3)
    ap.add_argument("--frames-per-video", type=int, default=5)
    ap.add_argument("--output", default="siglip_samples")
    args = ap.parse_args(argv)

    res = SiglipResources(args.texts, args.edges)
    vids_df = read_csv_with_fallback(args.videos)
    id_col = "video_id" if "video_id" in vids_df.columns else "FileName"
    path_of = dict(zip(vids_df[id_col].astype(str), vids_df["FileName"]))

    ids = args.video_ids or [
        v for v in vids_df[id_col].astype(str)
        if res.video_to_positives.get(v)
    ][: args.num_samples]
    if not ids:
        raise SystemExit("no video ids with positive edges found")

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_f = args.frames_per_video
    fig, axes = plt.subplots(
        len(ids), n_f, figsize=(2.2 * n_f, 2.6 * len(ids)), squeeze=False
    )
    for r, vid in enumerate(ids):
        frames = load_frames(str(path_of[vid]), n_f)
        positives = res.sample_positives(vid, k=1)
        prompt = positives[0][0] if positives else "(no positive)"
        for c in range(n_f):
            ax = axes[r][c]
            ax.imshow(frames[min(c, len(frames) - 1)].astype(np.uint8))
            ax.axis("off")
            if c == 0:
                ax.set_title(
                    textwrap.fill(f"{vid}: {prompt}", 40),
                    fontsize=7, loc="left",
                )
    fig.tight_layout()
    out = out_dir / "siglip_samples.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print(f"wrote {out} ({len(ids)} videos x {n_f} frames)")


if __name__ == "__main__":
    main()
