"""Qualitative retrieval reports: best/worst examples as standalone HTML.

Reference counterparts: utils/siglip_logging.py:106-484 (per-sample
qualitative records/HTML) and utils/wandb_logger.py:625-807 (best/worst
retrieval media panels). wandb-free: a self-contained HTML page per epoch
with optional embedded key frames (base64 PNG).
"""

from __future__ import annotations

import base64
import html
import io
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def _frame_to_png_b64(frame: np.ndarray) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = np.asarray(frame)
    f = (f - f.min()) / max(float(f.max() - f.min()), 1e-6)
    fig, ax = plt.subplots(figsize=(2.2, 2.2))
    ax.imshow(f)
    ax.axis("off")
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", dpi=60)
    import matplotlib.pyplot as plt2

    plt2.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def filmstrip_b64(clip: np.ndarray, n_frames: int = 3) -> str:
    """[T, H, W, 3] clip -> base64 PNG filmstrip (first/middle/last frames),
    the wandb-free analogue of the reference's embedded playable videos
    (reference: utils/wandb_logger.py:625-906)."""
    clip = np.asarray(clip)
    T = clip.shape[0]
    idx = np.linspace(0, T - 1, min(n_frames, T)).round().astype(int)
    strip = np.concatenate([clip[i] for i in idx], axis=1)
    return _frame_to_png_b64(strip)


def load_clip_media(path: str, resize: int = 112) -> Optional[str]:
    """Decode a clip from disk and return its filmstrip b64 (None on any
    failure — media is best-effort, reports must never crash on IO)."""
    try:
        from deepcoro_clip_tpu.data.video_io import load_video

        clip = load_video(path, n_frames=3, resize=resize,
                          output_dtype="uint8")
        return filmstrip_b64(clip)
    except Exception:
        return None


def clip_to_gif_b64(clip: np.ndarray, fps: int = 8,
                    max_frames: int = 16, resize: int = 112) -> Optional[str]:
    """[T, H, W, 3] clip -> base64 animated GIF — a PLAYABLE video panel,
    the local equivalent of the reference's ``wandb.Video`` retrieval media
    (utils/wandb_logger.py:807-860). Returns None when PIL is missing."""
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return None
    clip = np.asarray(clip)
    T = clip.shape[0]
    idx = np.linspace(0, T - 1, min(max_frames, T)).round().astype(int)
    lo, hi = float(clip.min()), float(clip.max())
    frames = []
    for i in idx:
        f = (clip[i] - lo) / max(hi - lo, 1e-6)
        img = Image.fromarray((f * 255).astype(np.uint8))
        if resize and max(img.size) > resize:
            img = img.resize((resize, resize))
        frames.append(img.convert("P", palette=Image.ADAPTIVE))
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True,
                   append_images=frames[1:], duration=int(1000 / fps),
                   loop=0)
    return base64.b64encode(buf.getvalue()).decode()


def load_clip_gif(path: str, resize: int = 112) -> Optional[str]:
    """Decode a clip from disk into an animated-GIF b64 (best effort)."""
    try:
        from deepcoro_clip_tpu.data.video_io import load_video

        clip = load_video(path, n_frames=16, resize=resize,
                          output_dtype="uint8")
        return clip_to_gif_b64(clip, resize=resize)
    except Exception:
        return None


def save_retrieval_grid(records: List[Dict], out_png: str | Path,
                        n_frames: int = 4) -> Optional[Path]:
    """Grid image: one ROW per retrieval example (frames left-to-right,
    GT text + rank as the row title) — the reference's grid-logging analogue
    (utils/wandb_logger.py:860-906). records as in write_retrieval_report;
    rows with undecodable media are skipped."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    clips = []
    for r in records:
        clip = r.get("clip")
        if clip is None and r.get("path"):
            try:
                from deepcoro_clip_tpu.data.video_io import load_video

                clip = load_video(str(r["path"]), n_frames=n_frames,
                                  resize=112, output_dtype="uint8")
            except Exception:
                clip = None
        if clip is not None:
            clips.append((r, np.asarray(clip)))
    if not clips:
        return None
    fig, axes = plt.subplots(
        len(clips), n_frames,
        figsize=(2.0 * n_frames, 2.4 * len(clips)), squeeze=False)
    for row, (r, clip) in enumerate(clips):
        idx = np.linspace(0, clip.shape[0] - 1, n_frames).round().astype(int)
        for col, fi in enumerate(idx):
            ax = axes[row][col]
            f = clip[fi].astype(np.float32)
            f = (f - f.min()) / max(float(f.max() - f.min()), 1e-6)
            ax.imshow(f)
            ax.axis("off")
        axes[row][0].set_title(
            f"rank {r.get('gt_rank', '?')}: "
            f"{str(r.get('gt_text', ''))[:60]}",
            fontsize=8, loc="left")
    fig.tight_layout()
    out_png = Path(out_png)
    out_png.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=90)
    plt.close(fig)
    return out_png


def log_best_worst_retrievals(
    similarity_matrix: np.ndarray,
    all_paths: Sequence[str],
    unique_texts: Sequence[str],
    ground_truth_indices: Sequence[int],
    epoch: int,
    out_dir: str | Path,
    logger=None,
    num_examples: int = 5,
    ground_truth_texts: Optional[List[List[str]]] = None,
    animated: bool = True,
) -> Dict[str, Path]:
    """Best/worst retrieval VIDEO panels per epoch — API-shaped after the
    reference's wandb media logger (utils/wandb_logger.py:625-807), local-
    first: writes an animated-GIF HTML panel + a PNG grid per cohort into
    ``out_dir`` and, when ``logger`` wraps an active wandb run, mirrors the
    panel paths as media metrics. Best/worst are ranked by each video's MAX
    similarity (the reference's criterion), not its GT rank."""
    sim = np.asarray(similarity_matrix)
    n = min(num_examples, sim.shape[0])
    if n == 0:
        return {}
    max_scores = sim.max(axis=1)
    order = np.argsort(-max_scores)
    cohorts = {"best": order[:n], "worst": order[::-1][:n]}
    if set(map(int, cohorts["worst"])) == set(map(int, cohorts["best"])):
        # fewer than 2*n videos: the cohorts are the same rows — a second
        # panel labeled "worst" would just mislabel the best cohort
        del cohorts["worst"]
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written: Dict[str, Path] = {}
    k = min(5, sim.shape[1])
    for name, idxs in cohorts.items():
        records = []
        for i in idxs:
            i = int(i)
            gt = int(ground_truth_indices[i])
            gt_rank = int(1 + np.sum(sim[i] > sim[i, gt]))
            top = np.argsort(-sim[i])[:k]
            rec = {
                "path": all_paths[i] if i < len(all_paths) else "",
                "gt_text": (", ".join(ground_truth_texts[i])
                            if ground_truth_texts else unique_texts[gt]),
                "gt_rank": gt_rank,
                "max_score": float(max_scores[i]),
                "topk_texts": [unique_texts[t] for t in top],
                "topk_scores": [float(sim[i, t]) for t in top],
            }
            if animated and rec["path"]:
                rec["media_b64"] = load_clip_gif(str(rec["path"]))
                rec["media_mime"] = "image/gif"
            records.append(rec)
        html_path = write_retrieval_report(
            out_dir / f"{name}_retrievals_epoch_{epoch}.html", records,
            title=f"{name} retrievals epoch {epoch}",
            n_best=n, n_worst=0,
            section_title=f"{name.capitalize()} retrievals",
        )
        written[f"{name}_html"] = html_path
        grid = save_retrieval_grid(
            records, out_dir / f"{name}_retrievals_epoch_{epoch}.png")
        if grid:
            written[f"{name}_grid"] = grid
    if logger is not None:
        for key, p in written.items():
            if str(p).endswith(".png"):
                logger.log_media(f"qualitative/{key}", p, step=epoch)
    return written


def write_retrieval_report(
    out_path: str | Path,
    records: List[Dict],
    title: str = "Retrieval qualitative report",
    n_best: int = 10,
    n_worst: int = 10,
    section_title: str = "Best retrievals",
) -> Path:
    """records: [{"path", "gt_text", "gt_rank", "topk_texts": [...],
    "topk_scores": [...], "frame": optional HxWx3 array}]. When the caller
    passes a single cohort (n_worst=0), ``section_title`` names it."""
    records = sorted(records, key=lambda r: r.get("gt_rank", 1))
    chosen = [(section_title, records[:n_best])]
    if n_worst > 0:
        chosen.append(("Worst retrievals", records[-n_worst:][::-1]))
    # embed media for the selected rows only (decode is per-row IO)
    for _, recs in chosen:
        for r in recs:
            if r.get("frame") is None and r.get("media_b64") is None \
                    and r.get("path"):
                r["media_b64"] = load_clip_media(str(r["path"]))
    parts = [f"<html><head><meta charset='utf-8'><title>{html.escape(title)}"
             "</title><style>body{font-family:sans-serif;margin:2em}"
             "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
             "padding:6px;vertical-align:top}</style></head><body>"]
    parts.append(f"<h1>{html.escape(title)}</h1>")
    for section, recs in chosen:
        parts.append(f"<h2>{section}</h2><table><tr><th>clip</th>"
                     "<th>GT text (rank)</th><th>top-k retrieved</th></tr>")
        for r in recs:
            img = ""
            if r.get("media_b64"):
                mime = r.get("media_mime", "image/png")
                img = (f"<img src='data:{mime};base64,"
                       f"{r['media_b64']}'/><br/>")
            elif r.get("frame") is not None:
                img = (f"<img src='data:image/png;base64,"
                       f"{_frame_to_png_b64(r['frame'])}'/><br/>")
            topk = "<br/>".join(
                f"{html.escape(str(t))} ({s:.3f})"
                for t, s in zip(r.get("topk_texts", []),
                                r.get("topk_scores", []))
            )
            parts.append(
                f"<tr><td>{img}{html.escape(str(r.get('path', '')))}</td>"
                f"<td>{html.escape(str(r.get('gt_text', '')))} "
                f"(rank {r.get('gt_rank', '?')})</td><td>{topk}</td></tr>"
            )
        parts.append("</table>")
    parts.append("</body></html>")
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text("".join(parts))
    return out_path


def get_best_epoch(run_dir: str | Path, key: str = "val/loss",
                   mode: str = "min") -> Optional[int]:
    """Best epoch from the metrics.jsonl history (reference ValidationLogger
    get_best_epoch, utils/validation_logger.py:505-613)."""
    from deepcoro_clip_tpu.utils.plot_metrics import load_history

    hist = [h for h in load_history(run_dir) if key in h]
    if not hist:
        return None
    pick = min if mode == "min" else max
    best = pick(hist, key=lambda h: h[key])
    return int(best.get("step", 0))
