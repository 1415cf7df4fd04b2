"""ctypes binding for the native fastvideo preprocessing library.

Auto-builds ``native/libfastvideo.so`` on first use when a compiler is
available (pybind11 is not in this image; ctypes keeps the boundary thin).
All entry points degrade gracefully: ``available()`` is False when the
library can't be built, and callers fall back to numpy/cv2.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libfastvideo.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["sh", str(_NATIVE_DIR / "build.sh")],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO_PATH.exists() and os.environ.get("DEEPCORO_NO_NATIVE") != "1":
        _build()
    if not _SO_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.fv_resize_bilinear.argtypes = [u8p, c, c, c, c, f32p, c, c]
    lib.fv_sample_resize_normalize.argtypes = [
        u8p, c, c, c, c, i64p, c, f32p, c, c, f32p, f32p, c,
    ]
    lib.fv_channel_stats.argtypes = [u8p, ctypes.c_int64, c, f64p, f64p]
    if hasattr(lib, "fv_augment_op"):  # older .so without the augment entry
        lib.fv_augment_op.argtypes = [
            u8p, c, c, c, c, c, ctypes.c_float, ctypes.c_float,
        ]
    if hasattr(lib, "fv_space_to_depth_batch"):  # patch-major wire (round 3)
        lib.fv_space_to_depth_batch.argtypes = [
            u8p, c, c, c, c, c, c, c, c, u8p,
        ]
    if hasattr(lib, "fv_sample_resize_u8"):  # uint8-output resize (round 3)
        lib.fv_resize_bilinear_u8.argtypes = [u8p, c, c, c, c, u8p, c, c]
        lib.fv_sample_resize_u8.argtypes = [u8p, c, c, c, c, i64p, c, u8p, c, c]
        lib.fv_sample_resize_patch.argtypes = [
            u8p, c, c, c, c, i64p, c, c, c, c, c, c, u8p,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resize_bilinear(frames: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """[F,H,W,C] uint8 -> [F,oh,ow,C] float32."""
    lib = _load()
    assert lib is not None
    if frames.dtype != np.uint8:
        raise TypeError(f"fastvideo operates on uint8 frames, got {frames.dtype}")
    frames = np.ascontiguousarray(frames, np.uint8)
    F, H, W, C = frames.shape
    out = np.empty((F, oh, ow, C), np.float32)
    lib.fv_resize_bilinear(frames, F, H, W, C, out, oh, ow)
    return out


def sample_resize_normalize(
    frames: np.ndarray,
    idx: np.ndarray,
    oh: int,
    ow: int,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fused gather+resize+normalize: [F,H,W,C] u8 + [n] idx -> [n,oh,ow,C] f32."""
    lib = _load()
    assert lib is not None
    if frames.dtype != np.uint8:
        raise TypeError(f"fastvideo operates on uint8 frames, got {frames.dtype}")
    frames = np.ascontiguousarray(frames, np.uint8)
    F, H, W, C = frames.shape
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx), oh, ow, C), np.float32)
    do_norm = mean is not None
    m = np.ascontiguousarray(mean if do_norm else np.zeros(C), np.float32)
    s = np.ascontiguousarray(std if std is not None else np.ones(C), np.float32)
    lib.fv_sample_resize_normalize(
        frames, F, H, W, C, idx, len(idx), out, oh, ow, m, s, int(do_norm)
    )
    return out


def u8_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fv_sample_resize_u8")


def resize_bilinear_u8(frames: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """[F,H,W,C] uint8 -> [F,oh,ow,C] uint8 (round-half-up).

    The uint8-wire resize: normalization folds into the device patchify
    weights, so the host keeps pixels uint8 end-to-end (1/4 the write
    traffic of the float32 resize and no separate cast pass)."""
    lib = _load()
    assert lib is not None
    if frames.dtype != np.uint8:
        raise TypeError(f"fastvideo operates on uint8 frames, got {frames.dtype}")
    frames = np.ascontiguousarray(frames, np.uint8)
    F, H, W, C = frames.shape
    out = np.empty((F, oh, ow, C), np.uint8)
    lib.fv_resize_bilinear_u8(frames, F, H, W, C, out, oh, ow)
    return out


def sample_resize_u8(
    frames: np.ndarray, idx: np.ndarray, oh: int, ow: int
) -> np.ndarray:
    """Fused gather+resize: [F,H,W,C] u8 + [n] idx -> [n,oh,ow,C] u8."""
    lib = _load()
    assert lib is not None
    if frames.dtype != np.uint8:
        raise TypeError(f"fastvideo operates on uint8 frames, got {frames.dtype}")
    frames = np.ascontiguousarray(frames, np.uint8)
    F, H, W, C = frames.shape
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx), oh, ow, C), np.uint8)
    lib.fv_sample_resize_u8(frames, F, H, W, C, idx, len(idx), out, oh, ow)
    return out


def sample_resize_patch(
    frames: np.ndarray,
    idx: np.ndarray,
    oh: int,
    ow: int,
    patch: tuple[int, int, int],
) -> np.ndarray:
    """Fused gather+resize+space-to-depth for the patch-major serving wire.

    [F,H,W,C] u8 + [T] idx -> [L, K] u8 with L = (T/pt)(oh/ph)(ow/pw),
    K = pt*ph*pw*C — the resized frames are never materialized
    (data/patch_wire.py layout; device patchify is a pure MXU dot)."""
    lib = _load()
    assert lib is not None
    if frames.dtype != np.uint8:
        raise TypeError(f"fastvideo operates on uint8 frames, got {frames.dtype}")
    pt, ph, pw = patch
    if len(idx) % pt or oh % ph or ow % pw:
        raise ValueError(
            f"patch {patch} must divide (T={len(idx)}, oh={oh}, ow={ow})"
        )
    frames = np.ascontiguousarray(frames, np.uint8)
    F, H, W, C = frames.shape
    idx = np.ascontiguousarray(idx, np.int64)
    L = (len(idx) // pt) * (oh // ph) * (ow // pw)
    out = np.empty((L, pt * ph * pw * C), np.uint8)
    lib.fv_sample_resize_patch(
        frames, F, H, W, C, idx, len(idx), oh, ow, pt, ph, pw, out
    )
    return out


def augment_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fv_augment_op")


def augment_op(clip: np.ndarray, op_id: int, level: float, sign: float) -> np.ndarray:
    """Apply one RandAugment op IN PLACE on a [T,H,W,C] uint8 clip.

    ``op_id`` indexes randaugment.OPS order; semantics match the numpy
    oracle in data/randaugment.py (parity-tested)."""
    lib = _load()
    assert lib is not None
    if clip.dtype != np.uint8:
        raise TypeError(f"fastvideo operates on uint8 clips, got {clip.dtype}")
    clip = np.ascontiguousarray(clip)
    T, H, W, C = clip.shape
    lib.fv_augment_op(clip, T, H, W, C, int(op_id), float(level), float(sign))
    return clip


def channel_stats(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Returns (sum[C], sumsq[C], n_pixels) over a uint8 array [..., C]."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, np.uint8)
    C = frames.shape[-1]
    n = int(frames.size // C)
    s = np.zeros(C, np.float64)
    ss = np.zeros(C, np.float64)
    lib.fv_channel_stats(frames.reshape(-1, C), n, C, s, ss)
    return s, ss, n
