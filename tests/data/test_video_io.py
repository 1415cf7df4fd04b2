"""load_video contract tests (reference: tests/test_video_utils.py)."""

import numpy as np
import pytest

from deepcoro_clip_tpu.data.video_io import load_video, sample_frame_indices

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def avi_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("vids") / "clip.avi"
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48)
    )
    r = np.random.default_rng(0)
    for _ in range(40):
        w.write(r.integers(0, 255, size=(48, 64, 3)).astype(np.uint8))
    w.release()
    return str(path)


@pytest.fixture(scope="module")
def npy_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("vids") / "clip.npy"
    r = np.random.default_rng(1)
    np.save(path, r.integers(0, 255, size=(20, 48, 64, 3)).astype(np.uint8))
    return str(path)


def test_avi_decode_shape(avi_path):
    v = load_video(avi_path, n_frames=16, resize=32)
    assert v.shape == (16, 32, 32, 3)
    assert v.dtype == np.float32


def test_npy_fast_path(npy_path):
    v = load_video(npy_path, n_frames=8, resize=24)
    assert v.shape == (8, 24, 24, 3)


def test_short_video_pads_last_frame(npy_path):
    v = load_video(npy_path, n_frames=64, resize=24, stride=1)
    # 20 raw frames -> last 44 sampled frames repeat the final frame
    np.testing.assert_array_equal(v[20], v[63])


def test_grayscale_expands_channels(tmp_path):
    p = tmp_path / "gray.npy"
    np.save(p, np.random.default_rng(0).integers(0, 255, size=(8, 32, 32)))
    v = load_video(str(p), n_frames=4, resize=16)
    assert v.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(v[..., 0], v[..., 1])


def test_normalization(npy_path):
    v = load_video(npy_path, n_frames=8, resize=24,
                   mean=[127.0] * 3, std=[50.0] * 3)
    raw = load_video(npy_path, n_frames=8, resize=24)
    np.testing.assert_allclose(v, (raw - 127.0) / 50.0, atol=1e-5)


def test_stride_subsampling_deterministic_eval():
    idx = sample_frame_indices(40, 16, 2, rng=None)
    assert len(idx) == 16
    assert idx.max() < 40
    idx2 = sample_frame_indices(40, 16, 2, rng=None)
    np.testing.assert_array_equal(idx, idx2)


def test_rand_augment_changes_pixels(npy_path):
    rng = np.random.default_rng(0)
    a = load_video(npy_path, n_frames=4, resize=16, rand_augment=True, rng=rng)
    b = load_video(npy_path, n_frames=4, resize=16)
    assert not np.allclose(a, b)
