"""3D axial rotary position embeddings (RoPE) for video tokens.

Behavioral spec from the reference ``Rope3D`` (reference: models/rope_3d.py:47-252):
- the head dim is split into three groups rotated by position along T / H / W;
- special (CLS) tokens at the front get the identity rotation (:174-179);
- a ``temporal_scale`` knob stretches the T-axis positions;
- tables are precomputed once per (T, H, W).

TPU-first design: instead of the reference's interleaved per-chunk rotation
(monkey-patched into torchvision attention at runtime), we lay the rotated
dims out so a SINGLE global rotate-half applies the full 3D rotation:

    head_dim = d.  First half [0, d/2) holds the "a" lanes of every axis
    (t, h, w, then unrotated padding), second half [d/2, d) holds the matching
    "b" lanes in the same order.  Then

        rope(x) = x * cos + rotate_half(x) * sin,
        rotate_half(x) = concat(-x[d/2:], x[:d/2])

    with per-dim sin/cos tables of shape [L, d].  Unrotated dims carry
    sin=0 / cos=1 so they pass through untouched.

This is two fused VPU multiplies, identical inside XLA and inside the Pallas
flash-attention kernel (ops/flash_attention.py) — no sub-lane slicing.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Rope3DTables:
    """Flat per-token rotation tables; identity rows for special tokens.

    sin/cos: float32 ``[n_special + T*H*W, head_dim]``.
    """

    sin: np.ndarray
    cos: np.ndarray
    head_dim: int
    thw: Tuple[int, int, int]
    n_special: int

    @property
    def length(self) -> int:
        return self.sin.shape[0]


def _axis_halves(head_dim: int) -> Tuple[int, int, int]:
    """Number of rotated lane-pairs per axis. Generalises the reference's
    divisible-by-6 requirement (reference: models/rope_3d.py:82-98): any
    leftover lanes are identity."""
    if head_dim % 2:
        raise ValueError(f"head_dim must be even, got {head_dim}")
    per_axis = head_dim // 6
    return per_axis, per_axis, per_axis


def _axis_freqs(n_pairs: int, base: float = 10000.0) -> np.ndarray:
    return 1.0 / (base ** (np.arange(n_pairs, dtype=np.float64) / max(n_pairs, 1)))


def build_rope3d_tables(
    head_dim: int,
    T: int,
    H: int,
    W: int,
    n_special: int = 0,
    temporal_scale: float = 1.0,
    base: float = 10000.0,
) -> Rope3DTables:
    th, hh_, wh = _axis_halves(head_dim)
    half = head_dim // 2
    L = T * H * W

    # Per-token (t, h, w) grid coordinates, flattened T-major to match the
    # patchify reshape [T, H, W] -> [L].
    tt, hh, ww = np.meshgrid(
        np.arange(T, dtype=np.float64) * temporal_scale,
        np.arange(H, dtype=np.float64),
        np.arange(W, dtype=np.float64),
        indexing="ij",
    )
    coords = (tt.reshape(L), hh.reshape(L), ww.reshape(L))
    pairs = (th, hh_, wh)

    sin_half = np.zeros((L, half), dtype=np.float32)
    cos_half = np.ones((L, half), dtype=np.float32)
    off = 0
    for pos, n_pairs in zip(coords, pairs):
        if n_pairs == 0:
            continue
        ang = pos[:, None] * _axis_freqs(n_pairs, base)[None, :]
        sin_half[:, off : off + n_pairs] = np.sin(ang)
        cos_half[:, off : off + n_pairs] = np.cos(ang)
        off += n_pairs

    sin = np.concatenate([sin_half, sin_half], axis=1)
    cos = np.concatenate([cos_half, cos_half], axis=1)

    if n_special:
        sin = np.concatenate([np.zeros((n_special, head_dim), np.float32), sin], 0)
        cos = np.concatenate([np.ones((n_special, head_dim), np.float32), cos], 0)

    return Rope3DTables(
        sin=sin, cos=cos, head_dim=head_dim, thw=(T, H, W), n_special=n_special
    )


def rotate_half_np(x: np.ndarray) -> np.ndarray:
    """Numpy oracle of the global rotate-half."""
    half = x.shape[-1] // 2
    return np.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope_np(x: np.ndarray, tables: Rope3DTables) -> np.ndarray:
    """Numpy oracle: apply the rotation to ``x`` of shape [..., L, head_dim]."""
    return x * tables.cos + rotate_half_np(x) * tables.sin
