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


def test_unknown_op_is_noop():
    clip = _clip(1)
    out = fv.augment_op(clip.copy(), 99, 9.0, 1.0)
    np.testing.assert_array_equal(out, clip)
