"""Patch-major uint8 wire: host-side space-to-depth for the video patchify.

The device-side patchify (models/layers.PatchEmbed3D) is a space-to-depth
plus one MXU matmul. The matmul is fast; the space-to-depth is not — XLA's
operand copy gathers strided uint8 at 22.6 GiB/s (~5.5 ms/step, 5.8% of the
flagship train step; dev/profile_step.py, round 3). TPU tiles want >=128
contiguous lanes and the raw wire's trailing dim is C=3.

This module moves that layout change to the host, where it is a sequence of
contiguous 48-byte memcpys (native/fastvideo.cpp::fv_space_to_depth, numpy
fallback here): videos travel as ``[B, N, L, K]`` uint8 (L = T'·H'·W' tokens,
K = pt·ph·pw·C patch bytes) and the device patchify becomes a pure
``[.., K] @ [K, dim]`` dot — reference counterpart: the host-side normalize
in utils/video.py:278-288 (we keep normalization folded into the patchify
weights; only the LAYOUT moves to the host).

K ordering matches _PatchProj's contraction: ((dt*ph + dh)*pw + dw)*C + c.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from deepcoro_clip_tpu.data import fastvideo_binding as fv


def patch_grid(frames: int, height: int, width: int,
               patch: Tuple[int, int, int]) -> Tuple[int, int, int]:
    """Token-grid dims (T', H', W') for a clip shape under ``patch``."""
    pt, ph, pw = patch
    if frames % pt or height % ph or width % pw:
        raise ValueError(
            f"patch wire requires whole patches: clip {frames}x{height}x"
            f"{width} vs patch {patch}"
        )
    return frames // pt, height // ph, width // pw


def space_to_depth(clip: np.ndarray,
                   patch: Tuple[int, int, int]) -> np.ndarray:
    """[T, H, W, C] uint8 -> [L, K] uint8 (numpy oracle)."""
    pt, ph, pw = patch
    T, H, W, C = clip.shape
    Tn, Hn, Wn = patch_grid(T, H, W, patch)
    p = clip.reshape(Tn, pt, Hn, ph, Wn, pw, C)
    return np.ascontiguousarray(
        p.transpose(0, 2, 4, 1, 3, 5, 6).reshape(Tn * Hn * Wn, pt * ph * pw * C)
    )


def depth_to_space(tokens: np.ndarray, grid: Tuple[int, int, int],
                   patch: Tuple[int, int, int], channels: int = 3) -> np.ndarray:
    """[L, K] -> [T, H, W, C]: exact inverse of :func:`space_to_depth`
    (qualitative media panels decode filmstrips from the wire batch)."""
    pt, ph, pw = patch
    Tn, Hn, Wn = grid
    p = tokens.reshape(Tn, Hn, Wn, pt, ph, pw, channels)
    return np.ascontiguousarray(
        p.transpose(0, 3, 1, 4, 2, 5, 6).reshape(Tn * pt, Hn * ph, Wn * pw,
                                                 channels)
    )


def _native_batch(videos: np.ndarray, patch: Tuple[int, int, int],
                  grid: Tuple[int, int, int]) -> np.ndarray:
    lib = fv._load()
    pt, ph, pw = patch
    Tn, Hn, Wn = grid
    lead = videos.shape[:-4]
    T, H, W, C = videos.shape[-4:]
    bn = int(np.prod(lead, dtype=np.int64)) if lead else 1
    out = np.empty(lead + (Tn * Hn * Wn, pt * ph * pw * C), np.uint8)
    lib.fv_space_to_depth_batch(
        np.ascontiguousarray(videos, np.uint8).reshape(bn, T, H, W, C),
        bn, T, H, W, C, pt, ph, pw, out.reshape(bn, out.shape[-2], out.shape[-1]),
    )
    return out


def patchify_videos(videos: np.ndarray,
                    patch: Tuple[int, int, int]) -> np.ndarray:
    """[..., T, H, W, C] uint8 -> [..., L, K] uint8 (native when available).

    Accepts any number of leading batch dims ([B,N,...], [B,...], [...]).
    """
    if videos.dtype != np.uint8:
        raise TypeError(f"patch wire is uint8-only, got {videos.dtype}")
    T, H, W, C = videos.shape[-4:]
    grid = patch_grid(T, H, W, patch)
    if fv.available() and hasattr(fv._load(), "fv_space_to_depth_batch"):
        return _native_batch(videos, patch, grid)
    lead = videos.shape[:-4]
    flat = videos.reshape((-1,) + videos.shape[-4:])
    out = np.stack([space_to_depth(c, patch) for c in flat])
    return out.reshape(lead + out.shape[-2:])
