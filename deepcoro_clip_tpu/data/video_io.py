"""Host-side video decode -> frame-sample -> resize -> normalize.

Behavioral spec from the reference ``load_video`` (reference:
utils/video.py:140-299): ``.npy`` fast path (:174-181), stride subsampling
(:191-192), BGR->RGB + grayscale->3ch (:215-224), pad-last-frame or linspace
subsample to the expected frame count (:247-254), resize (:256-258), optional
light augmentation, per-channel normalize (:278-288); returns
``[F, H, W, C]`` float32.

TPU-first split of responsibilities: decode + frame selection + resize happen
here on the host (cv2 when available); normalization is FUSED INTO THE DEVICE
STEP whenever possible (the train step normalizes on-TPU so the PCIe transfer
can carry uint8). The C++ `native/fastvideo` kernel accelerates the
resize+sample hot path when built.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
    cv2.setNumThreads(0)
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

from deepcoro_clip_tpu.data import fastvideo_binding as _fast


def _decode_container(path: str, max_frames: int = 1024) -> np.ndarray:
    """Decode a video container to [F, H, W, 3] uint8 (RGB)."""
    if not _HAS_CV2:
        raise RuntimeError("cv2 unavailable; only .npy/.npz clips supported")
    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    if not cap.isOpened():
        cap = cv2.VideoCapture(path)
    frames = []
    try:
        while len(frames) < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            if frame.ndim == 2:
                frame = frame[:, :, None]
            if frame.shape[2] == 1:
                frame = np.repeat(frame, 3, axis=2)
            else:
                frame = frame[:, :, ::-1]  # BGR -> RGB
            frames.append(frame)
    finally:
        cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


def _load_raw(path: str) -> np.ndarray:
    """[F, H, W, C] uint8/float; .npy/.npz direct path (reference :174-181)."""
    suffix = Path(path).suffix.lower()
    if suffix == ".npy":
        arr = np.load(path)
    elif suffix == ".npz":
        with np.load(path) as z:
            arr = z[list(z.keys())[0]]
    else:
        arr = _decode_container(path)
    arr = np.asarray(arr)
    if arr.ndim == 3:  # [F, H, W] grayscale
        arr = arr[..., None]
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr


def sample_frame_indices(
    total: int, n_frames: int, stride: int, rng: Optional[np.random.Generator]
) -> np.ndarray:
    """Stride subsample with random phase in training, then pad-last /
    linspace to exactly n_frames (reference :191-192, :247-254)."""
    idx = np.arange(0, total, max(1, stride))
    if rng is not None and stride > 1 and total > stride:
        phase = int(rng.integers(0, stride))
        idx = np.arange(phase, total, stride)
    if len(idx) >= n_frames:
        if rng is not None and len(idx) > n_frames:
            start = int(rng.integers(0, len(idx) - n_frames + 1))
            idx = idx[start : start + n_frames]
        else:
            idx = idx[np.linspace(0, len(idx) - 1, n_frames).round().astype(int)]
    else:
        pad = np.full(n_frames - len(idx), idx[-1] if len(idx) else 0)
        idx = np.concatenate([idx, pad])
    return idx.astype(np.int64)


def _resize_frames(frames: np.ndarray, size: int) -> np.ndarray:
    if frames.shape[1] == size and frames.shape[2] == size:
        return frames
    # the native kernel operates on uint8; float-valued .npy clips must take
    # the cv2/numpy path (a uint8 cast would silently truncate them)
    if frames.dtype == np.uint8 and _fast.available():
        return _fast.resize_bilinear(frames, size, size)
    if _HAS_CV2:
        if frames.dtype not in (np.uint8, np.float32):
            frames = frames.astype(np.float32)  # cv2 rejects e.g. int64
        return np.stack(
            [cv2.resize(f, (size, size), interpolation=cv2.INTER_LINEAR)
             for f in frames]
        )
    # numpy bilinear fallback
    F, H, W, C = frames.shape
    ys = np.linspace(0, H - 1, size)
    xs = np.linspace(0, W - 1, size)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    f = frames.astype(np.float32)
    top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x1] * wx
    bot = f[:, y1][:, :, x0] * (1 - wx) + f[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def augment_frames(frames: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """RandAugment(magnitude=9, num_ops=2) on the uint8 clip, matching the
    reference (utils/video.py:268-275), plus the 50% horizontal flip.

    CONSUMES ``frames`` on the uint8 path: the native ops run in place, so
    the caller's buffer may hold augmented pixels afterwards. The uint8 hot
    path (quality corpora, the serving wire) skips the clip/round cast — it
    is an identity on uint8 pixels and was costing two full-clip copies per
    sample on the 1-core loader host. ``copy=False`` is safe here:
    ``load_video`` owns ``frames`` (fresh fancy-index gather) and the flip's
    ascontiguousarray materializes a fresh buffer."""
    from deepcoro_clip_tpu.data.randaugment import rand_augment_clip

    if frames.dtype == np.uint8:
        u8 = frames
    else:
        u8 = np.clip(frames, 0, 255).astype(np.uint8)
    if rng.random() < 0.5:
        u8 = u8[:, :, ::-1, :]
    return rand_augment_clip(np.ascontiguousarray(u8), rng,
                             magnitude=9, num_ops=2, copy=False)


def load_video(
    path: str,
    n_frames: int = 16,
    resize: int = 224,
    stride: int = 1,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
    rand_augment: bool = False,
    rng: Optional[np.random.Generator] = None,
    normalize: bool = True,
    output_dtype: str = "float32",
    mono: bool = False,
) -> np.ndarray:
    """Returns [n_frames, resize, resize, 3] (reference contract), or
    [..., 1] with ``mono=True``.

    ``output_dtype="float32"`` (default): host-normalized float frames, the
    reference behavior.  ``output_dtype="uint8"``: raw [0, 255] pixels for the
    uint8 H2D wire — normalization happens on-device (ops/pixels.py), the
    transfer carries 1/4 the bytes.  uint8 output assumes pixel-valued
    sources; float sources are clipped to [0, 255] (use float32 wire for
    pre-scaled data).

    ``mono=True`` (config.mono_wire): keep channel 0 only — the grayscale
    H2D wire. The slice happens BEFORE resize/augment, so the whole host
    pipeline (and the H2D transfer) runs on a third of the bytes; the
    device folds the channel replication into the patchify weights
    (models/layers._PatchProj). Lossless for grayscale-replicated sources
    (the reference's DICOM luma -> RGB, utils/video.py:247-288; for
    channel-uniform clips every RandAugment op commutes with the slice —
    color degenerates to identity, per-channel LUTs coincide).
    """
    raw = _load_raw(path)
    if mono and raw.ndim == 4 and raw.shape[-1] > 1:
        raw = np.ascontiguousarray(raw[..., :1])
    idx = sample_frame_indices(raw.shape[0], n_frames, stride, rng)
    if (
        output_dtype == "uint8"
        and raw.dtype == np.uint8
        and raw.shape[1:3] != (resize, resize)
        and _fast.u8_available()
    ):
        # uint8 wire: fused native gather+resize straight to uint8 — skips
        # the numpy index-gather copy, the float32 resize buffer (4x the
        # bytes), and the round/cast pass below (round-half-up vs numpy's
        # half-even on the f32 path: a <=1/255 difference on exact halves)
        frames = _fast.sample_resize_u8(raw, idx, resize, resize)
    else:
        frames = raw[idx]
        frames = _resize_frames(frames, resize)
    if rand_augment and rng is not None:
        frames = augment_frames(frames, rng)
    if output_dtype == "uint8":
        if frames.dtype != np.uint8:
            frames = np.clip(frames, 0, 255).round()
        return np.ascontiguousarray(frames, dtype=np.uint8)
    frames = frames.astype(np.float32)
    if normalize:
        m = np.asarray(mean if mean is not None else [0.0] * 3, np.float32)
        s = np.asarray(std if std is not None else [1.0] * 3, np.float32)
        if m.shape[0] > frames.shape[-1]:  # mono: channel-uniform stats
            m, s = m[: frames.shape[-1]], s[: frames.shape[-1]]
        frames = (frames - m) / np.maximum(s, 1e-6)
    return np.ascontiguousarray(frames, dtype=np.float32)
