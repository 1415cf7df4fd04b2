"""Rope3D numeric parity vs the reference implementation.

The reference (reference: models/rope_3d.py:47-252) interleaves rotation
pairs lane-by-lane per axis chunk; this repo lays the same pairs out
half-split (all "a" lanes, then all "b" lanes — ops/rope3d.py) so ONE global
rotate-half covers all three axes inside the Pallas kernel. The two layouts
are related by a fixed lane permutation, so:

- attention scores q·kᵀ after RoPE must agree EXACTLY (scores are
  permutation-invariant when q and k share the layout), and
- rotated outputs must agree up to that static permutation.

Known deliberate divergence (documented in docs/PARITY.md): for
``temporal_scale != 1`` the reference multiplies the frequency BASE
(reference: models/rope_3d.py:136-140: ``temporal_base * temporal_scale``
passed as the base), which leaves the first rotation pair's angle unchanged
for any scale; this repo scales the T coordinate instead, which stretches
every temporal angle uniformly. At the default scale 1.0 they coincide —
asserted here; the divergence at scale != 1 is asserted too so a silent
reference-behavior change would be caught.
"""

from __future__ import annotations

import numpy as np
import pytest

from deepcoro_clip_tpu.ops.rope3d import apply_rope_np, build_rope3d_tables

torch = pytest.importorskip("torch")


def _lane_permutation(head_dim: int) -> np.ndarray:
    """P such that ``x[..., P]`` re-lays this repo's half-split lanes into the
    reference's per-axis interleaved layout."""
    n_pairs = head_dim // 6  # pairs per axis (both impls: head_dim % 6 == 0)
    half = head_dim // 2
    perm = np.empty(head_dim, np.int64)
    for axis in range(3):
        axis_off = axis * (head_dim // 3)  # t_dim = h_dim = w_dim = D/3
        for i in range(n_pairs):
            g = axis * n_pairs + i  # our global pair index
            perm[axis_off + 2 * i] = g           # "a" lane
            perm[axis_off + 2 * i + 1] = half + g  # "b" lane
    return perm


def _reference_rope(reference, head_dim, num_heads, **kw):
    import importlib

    mod = importlib.import_module("models.rope_3d")
    return mod.Rope3D(embed_dim=head_dim * num_heads, num_heads=num_heads, **kw)


@pytest.mark.parametrize("n_special", [0, 1])
def test_scores_and_outputs_match(reference, n_special):
    B, Hn, Dh = 2, 2, 48
    T, H, W = 4, 7, 5
    L = n_special + T * H * W
    r = np.random.default_rng(0)
    q = r.normal(size=(B, Hn, L, Dh)).astype(np.float32)
    k = r.normal(size=(B, Hn, L, Dh)).astype(np.float32)

    perm = _lane_permutation(Dh)
    rope = _reference_rope(reference, Dh, Hn).eval()
    with torch.no_grad():
        qr_ref, kr_ref = rope(
            torch.from_numpy(q[..., perm]), torch.from_numpy(k[..., perm]),
            T, H, W, n_special=n_special,
        )
    qr_ref, kr_ref = qr_ref.numpy(), kr_ref.numpy()

    tables = build_rope3d_tables(Dh, T, H, W, n_special=n_special)
    qr, kr = apply_rope_np(q, tables), apply_rope_np(k, tables)

    # outputs agree up to the static lane permutation
    np.testing.assert_allclose(qr[..., perm], qr_ref, atol=2e-6)
    np.testing.assert_allclose(kr[..., perm], kr_ref, atol=2e-6)
    # attention scores agree directly (the quantity the model consumes)
    scores = np.einsum("bhqd,bhkd->bhqk", qr, kr)
    scores_ref = np.einsum("bhqd,bhkd->bhqk", qr_ref, kr_ref)
    np.testing.assert_allclose(scores, scores_ref, rtol=2e-5, atol=2e-4)


def test_reference_auto_cls_detection_matches_explicit_special(reference):
    """Reference auto-detects one CLS token when N == T*H*W + 1
    (reference: models/rope_3d.py:214-217); our tables make the same choice
    explicitly via n_special=1 — both must leave token 0 unrotated."""
    B, Hn, Dh = 1, 1, 24
    T, H, W = 2, 3, 3
    L = 1 + T * H * W
    r = np.random.default_rng(1)
    q = r.normal(size=(B, Hn, L, Dh)).astype(np.float32)
    k = r.normal(size=(B, Hn, L, Dh)).astype(np.float32)
    perm = _lane_permutation(Dh)

    rope = _reference_rope(reference, Dh, Hn).eval()
    with torch.no_grad():  # n_special omitted -> reference auto-detects 1
        qr_ref, _ = rope(torch.from_numpy(q[..., perm]),
                         torch.from_numpy(k[..., perm]), T, H, W)
    tables = build_rope3d_tables(Dh, T, H, W, n_special=1)
    qr = apply_rope_np(q, tables)
    np.testing.assert_allclose(qr[..., perm], qr_ref.numpy(), atol=2e-6)
    # CLS row untouched in both
    np.testing.assert_allclose(qr[:, :, 0], q[:, :, 0], atol=0)


def test_temporal_scale_divergence_is_the_documented_one(reference):
    """At scale 1.0 the impls agree (above); at scale != 1 the reference's
    base-multiplication leaves the FIRST temporal pair's angles unchanged
    (base**0 == 1 regardless of base) while this repo stretches them — pin
    both facts so either implementation changing silently fails here."""
    Dh, T, H, W = 24, 5, 1, 1
    scale = 4.0
    perm = _lane_permutation(Dh)
    q = np.ones((1, 1, T, Dh), np.float32)
    k = np.ones_like(q)

    rope_s = _reference_rope(reference, Dh, 1, temporal_scale=scale).eval()
    rope_1 = _reference_rope(reference, Dh, 1).eval()
    with torch.no_grad():
        qs, _ = rope_s(torch.from_numpy(q[..., perm]),
                       torch.from_numpy(k[..., perm]), T, H, W)
        q1, _ = rope_1(torch.from_numpy(q[..., perm]),
                       torch.from_numpy(k[..., perm]), T, H, W)
    # reference: first temporal pair identical across scales (base**0 == 1)
    np.testing.assert_allclose(qs.numpy()[..., :2], q1.numpy()[..., :2],
                               atol=1e-7)

    ours_s = apply_rope_np(q, build_rope3d_tables(Dh, T, H, W,
                                                  temporal_scale=scale))
    ours_1 = apply_rope_np(q, build_rope3d_tables(Dh, T, H, W))
    # ours: position scaling rotates the first pair differently at t >= 1
    first_pair = ours_s[0, 0, 1:, [0, Dh // 2]] - ours_1[0, 0, 1:, [0, Dh // 2]]
    assert np.abs(first_pair).max() > 1e-3
