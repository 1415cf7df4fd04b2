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
