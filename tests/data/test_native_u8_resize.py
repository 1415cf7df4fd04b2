"""Native uint8-output resize kernels (uint8/patch serving + loader wires).

Parity oracles: the float kernel `fv_sample_resize_normalize` (no-norm) is
the resize reference; uint8 outputs must equal its round-half-up
quantization exactly. The fused patch kernel must equal
space_to_depth(sample_resize_u8) byte-for-byte.
(Reference behavior being replaced: utils/video.py:256-288 host
resize+normalize; this wire keeps pixels uint8 end-to-end because
normalization folds into the device patchify weights.)
"""

import numpy as np
import pytest

from deepcoro_clip_tpu.data import fastvideo_binding as fv
from deepcoro_clip_tpu.data.patch_wire import space_to_depth

pytestmark = pytest.mark.skipif(
    not (fv.available() and fv.u8_available()),
    reason="native fastvideo with u8 kernels unavailable",
)


def _frames(F=12, H=50, W=70, C=3, seed=0):
    r = np.random.default_rng(seed)
    return r.integers(0, 256, size=(F, H, W, C)).astype(np.uint8)


def _halfup(f32):
    return np.floor(f32 + 0.5).astype(np.uint8)


def test_sample_resize_u8_matches_float_kernel():
    frames = _frames()
    idx = np.array([0, 3, 3, 11, 7], np.int64)
    ref = fv.sample_resize_normalize(frames, idx, 24, 32)  # no-norm float
    out = fv.sample_resize_u8(frames, idx, 24, 32)
    assert out.dtype == np.uint8 and out.shape == (5, 24, 32, 3)
    np.testing.assert_array_equal(out, _halfup(ref))


def test_sample_resize_u8_clamps_indices():
    frames = _frames(F=4)
    out = fv.sample_resize_u8(frames, np.array([-5, 99], np.int64), 16, 16)
    ref = fv.sample_resize_u8(frames, np.array([0, 3], np.int64), 16, 16)
    np.testing.assert_array_equal(out, ref)


def test_resize_bilinear_u8_matches_float_kernel():
    frames = _frames(F=3)
    ref = fv.resize_bilinear(frames, 20, 28)
    out = fv.resize_bilinear_u8(frames, 20, 28)
    np.testing.assert_array_equal(out, _halfup(ref))


def test_sample_resize_patch_is_fused_exactly():
    frames = _frames(F=16, H=90, W=110)
    idx = np.linspace(0, 15, 8).astype(np.int64)
    patch = (2, 8, 8)
    clips = fv.sample_resize_u8(frames, idx, 32, 48)
    want = space_to_depth(clips, patch)
    got = fv.sample_resize_patch(frames, idx, 32, 48, patch)
    assert got.shape == want.shape == (4 * 4 * 6, 2 * 8 * 8 * 3)
    np.testing.assert_array_equal(got, want)


def test_sample_resize_patch_rejects_non_divisible():
    frames = _frames(F=4)
    with pytest.raises(ValueError):
        fv.sample_resize_patch(frames, np.arange(3, dtype=np.int64),
                               16, 16, (2, 8, 8))


def test_load_video_uint8_wire_uses_fused_resize(tmp_path):
    from deepcoro_clip_tpu.data.video_io import load_video

    frames = _frames(F=10, H=48, W=48)
    p = tmp_path / "clip.npy"
    np.save(p, frames)
    v = load_video(str(p), n_frames=8, resize=32, output_dtype="uint8")
    idx = np.linspace(0, 9, 8).round().astype(np.int64)
    want = fv.sample_resize_u8(frames, idx, 32, 32)
    np.testing.assert_array_equal(v, want)
