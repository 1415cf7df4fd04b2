"""numpy RandAugment parity with the reference's
v2.RandAugment(magnitude=9, num_ops=2) behavior (utils/video.py:268-275)."""

import numpy as np
import pytest

from deepcoro_clip_tpu.data.randaugment import OPS, rand_augment_clip


@pytest.fixture
def clip():
    r = np.random.default_rng(0)
    return r.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)


@pytest.mark.parametrize("name", sorted(OPS))
def test_every_op_preserves_shape_dtype(name, clip):
    out = OPS[name](clip, 9.0, 1.0)
    assert out.shape == clip.shape
    assert out.dtype == np.uint8


def test_temporal_consistency(clip):
    """Same op params for every frame: a clip of identical frames stays a
    clip of identical frames."""
    static = np.repeat(clip[:1], 4, axis=0)
    out = rand_augment_clip(static, np.random.default_rng(3))
    for t in range(1, 4):
        np.testing.assert_array_equal(out[0], out[t])


def test_deterministic_given_rng(clip):
    a = rand_augment_clip(clip, np.random.default_rng(7))
    b = rand_augment_clip(clip, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)


def test_zero_magnitude_geometry_is_identity(clip):
    for name in ("rotate", "shear_x", "shear_y", "translate_x",
                 "translate_y"):
        out = OPS[name](clip, 0.0, 1.0)
        np.testing.assert_array_equal(out, clip)


def test_identity_and_posterize_semantics(clip):
    np.testing.assert_array_equal(OPS["identity"](clip, 9.0, 1.0), clip)
    post = OPS["posterize"](clip, 30.0, 1.0)  # 4 bits
    assert (np.asarray(post) & 0x0F == 0).all()


def test_solarize_inverts_bright_pixels():
    clip = np.full((1, 4, 4, 3), 250, np.uint8)
    out = OPS["solarize"](clip, 15.0, 1.0)  # threshold ~128
    assert (out == 5).all()


def test_augment_frames_uses_randaugment():
    from deepcoro_clip_tpu.data.video_io import augment_frames

    r = np.random.default_rng(0)
    clip = r.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    # augment_frames CONSUMES its input on the uint8 hot path (in-place
    # native ops, no defensive copy) — snapshot before calling.
    before = clip.copy()
    out = augment_frames(clip, np.random.default_rng(1))
    assert out.dtype == np.uint8 and out.shape == before.shape
    assert not np.array_equal(out, before)  # something happened
