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


def write_retrieval_report(
    out_path: str | Path,
    records: List[Dict],
    title: str = "Retrieval qualitative report",
    n_best: int = 10,
    n_worst: int = 10,
) -> Path:
    """records: [{"path", "gt_text", "gt_rank", "topk_texts": [...],
    "topk_scores": [...], "frame": optional HxWx3 array}]."""
    records = sorted(records, key=lambda r: r.get("gt_rank", 1))
    chosen = [("Best retrievals", records[:n_best]),
              ("Worst retrievals", records[-n_worst:][::-1])]
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
                img = (f"<img src='data:image/png;base64,"
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
