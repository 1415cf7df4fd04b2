"""C++ fastvideo RandAugment vs the numpy oracle, op by op.

Photometric LUT ops must match numpy exactly; float-path ops (affine warps,
sharpness, color) are allowed 1-ulp rounding differences at the uint8
truncation boundary (|diff| <= 1 on a tiny fraction of pixels)."""

import numpy as np
import pytest

from deepcoro_clip_tpu.data import fastvideo_binding as fv
from deepcoro_clip_tpu.data.randaugment import OPS, rand_augment_clip

pytestmark = pytest.mark.skipif(
    not fv.augment_available(), reason="native fastvideo unavailable"
)

EXACT = {"identity", "autocontrast", "equalize", "solarize", "posterize",
         "brightness"}
NEARLY = {"rotate", "shear_x", "shear_y", "translate_x", "translate_y",
          "sharpness", "color", "contrast"}


def _clip(seed=0, T=4, H=40, W=48):
    r = np.random.default_rng(seed)
    base = r.integers(10, 240, size=(1, H, W, 3)).astype(np.uint8)
    # temporally-correlated frames (realistic video, exercises clip-wide ops)
    return np.concatenate(
        [np.clip(base.astype(np.int16) + 5 * t, 0, 255).astype(np.uint8)
         for t in range(T)]
    )


@pytest.mark.parametrize("name", sorted(OPS))
@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_op_parity(name, sign):
    clip = _clip()
    op_id = list(OPS).index(name)
    ref = OPS[name](clip.copy(), 9.0, sign)
    out = fv.augment_op(clip.copy(), op_id, 9.0, sign)
    diff = np.abs(ref.astype(np.int16) - out.astype(np.int16))
    if name in EXACT:
        assert diff.max() == 0, f"{name}: max diff {diff.max()}"
    else:
        assert diff.max() <= 1, f"{name}: max diff {diff.max()}"
        # rounding disagreements must be rare
        assert (diff > 0).mean() < 0.02, f"{name}: {(diff > 0).mean():.4f}"


def test_native_numpy_same_rng_same_ops():
    """Both backends consume the identical RNG stream -> same sampled ops."""
    clip = _clip(3)
    a = rand_augment_clip(clip, np.random.default_rng(11), backend="numpy")
    b = rand_augment_clip(clip, np.random.default_rng(11), backend="native")
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 1


def test_native_does_not_mutate_input():
    clip = _clip(5)
    keep = clip.copy()
    rand_augment_clip(clip, np.random.default_rng(0), backend="native")
    np.testing.assert_array_equal(clip, keep)


def test_copy_false_bit_identical_and_may_mutate():
    """copy=False (the loader hot path) returns the same pixels as the
    default; it only drops the defensive duplicate of the caller's buffer."""
    clip = _clip(6)
    a = rand_augment_clip(clip.copy(), np.random.default_rng(3),
                          backend="native")
    b = rand_augment_clip(clip.copy(), np.random.default_rng(3),
                          backend="native", copy=False)
    np.testing.assert_array_equal(a, b)


def test_augment_frames_uint8_path_matches_cast_path():
    """The uint8 fast path (no clip/round cast) is bit-identical to feeding
    the same pixels as float — the cast it skips is an identity on uint8."""
    from deepcoro_clip_tpu.data.video_io import augment_frames

    clip = _clip(7)
    a = augment_frames(clip.copy(), np.random.default_rng(9))
    b = augment_frames(clip.astype(np.float32), np.random.default_rng(9))
    np.testing.assert_array_equal(a, b)


def test_unknown_op_is_noop():
    clip = _clip(1)
    out = fv.augment_op(clip.copy(), 99, 9.0, 1.0)
    np.testing.assert_array_equal(out, clip)


GEOM = ["rotate", "shear_x", "shear_y", "translate_x", "translate_y"]


@pytest.mark.parametrize("name", GEOM)
@pytest.mark.parametrize("level,sign", [(30.0, 1.0), (30.0, -1.0), (0.5, 1.0)])
def test_warp_extreme_and_tiny_magnitudes(name, level, sign):
    """Exercise the per-row warp tables at magnitude extremes: level 30
    translates by 0.45*W (most columns clamped -> short/no unit-stride
    runs), level 0.5 keeps everything interior (one full-width run)."""
    clip = _clip(2)
    op_id = list(OPS).index(name)
    ref = OPS[name](clip.copy(), level, sign)
    out = fv.augment_op(clip.copy(), op_id, level, sign)
    diff = np.abs(ref.astype(np.int16) - out.astype(np.int16))
    assert diff.max() <= 1, f"{name}@{level}: max diff {diff.max()}"
    assert (diff > 0).mean() < 0.02


@pytest.mark.parametrize("name", GEOM + ["sharpness", "color", "contrast"])
@pytest.mark.parametrize("shape", [(2, 1, 7), (2, 7, 1), (3, 2, 2), (1, 5, 129)])
def test_warp_degenerate_shapes(name, shape):
    """W=1 / H=1 / tiny frames: the clamped-edge and run-boundary logic
    must agree with the oracle (129 > one 64-byte LUT/SIMD block)."""
    T, H, W = shape
    r = np.random.default_rng(hash((name, shape)) % 2**32)
    clip = r.integers(0, 256, size=(T, H, W, 3)).astype(np.uint8)
    op_id = list(OPS).index(name)
    ref = OPS[name](clip.copy(), 9.0, -1.0)
    out = fv.augment_op(clip.copy(), op_id, 9.0, -1.0)
    diff = np.abs(ref.astype(np.int16) - out.astype(np.int16))
    assert diff.max() <= 1, f"{name}{shape}: max diff {diff.max()}"
