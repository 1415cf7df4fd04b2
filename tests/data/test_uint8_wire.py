"""uint8 H2D wire: raw pixels ship at 1/4 the bytes, normalization happens
on-device (ops/pixels.py). The device path must match the reference's
host-side normalization (reference: utils/video.py:278-288) bit-for-bit
within float tolerance."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepcoro_clip_tpu.data.video_io import load_video
from deepcoro_clip_tpu.ops.pixels import normalize_videos


@pytest.fixture
def clip_path(tmp_path):
    r = np.random.default_rng(0)
    arr = r.integers(0, 255, size=(10, 48, 48, 3)).astype(np.uint8)
    p = tmp_path / "clip.npy"
    np.save(p, arr)
    return str(p)


def test_uint8_output_is_raw_pixels(clip_path):
    v = load_video(clip_path, n_frames=8, resize=48, output_dtype="uint8")
    assert v.dtype == np.uint8
    assert v.shape == (8, 48, 48, 3)
    assert v.max() > 1  # raw pixel range, not normalized


def test_device_normalize_matches_host_normalize(clip_path):
    mean = [110.0, 115.0, 120.0]
    std = [50.0, 55.0, 60.0]
    host = load_video(clip_path, n_frames=8, resize=32, mean=mean, std=std,
                      output_dtype="float32")
    wire = load_video(clip_path, n_frames=8, resize=32, output_dtype="uint8")
    device = np.asarray(normalize_videos(jnp.asarray(wire), mean, std))
    # uint8 quantization of the (float) resize output costs at most 0.5
    # pixel value -> 0.5/min(std) in normalized units; nothing more.
    np.testing.assert_allclose(device, host, atol=0.5 / min(std) + 1e-5)


def test_float_batches_pass_through():
    x = jnp.ones((2, 4, 4, 3), jnp.float32) * 0.5
    out = normalize_videos(x, [100.0] * 3, [50.0] * 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_float_source_clipped_for_uint8_wire(tmp_path):
    arr = np.linspace(-20, 280, 4 * 8 * 8 * 3).reshape(4, 8, 8, 3).astype(np.float32)
    p = tmp_path / "f.npy"
    np.save(p, arr)
    v = load_video(str(p), n_frames=4, resize=8, output_dtype="uint8")
    assert v.dtype == np.uint8
    assert v.min() == 0 and v.max() == 255


def test_dataset_emits_uint8(tmp_path):
    import pandas as pd

    from deepcoro_clip_tpu.data.datasets import VideoClipDataset

    r = np.random.default_rng(0)
    rows = []
    for i in range(3):
        p = tmp_path / f"c{i}.npy"
        np.save(p, r.integers(0, 255, size=(6, 16, 16, 3)).astype(np.uint8))
        rows.append({"FileName": str(p), "Report": "r", "Split": "train",
                     "StudyInstanceUID": f"S{i}"})
    csv = tmp_path / "d.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    ds = VideoClipDataset(str(csv), frames=4, resize=16, wire_dtype="uint8")
    item = ds[0]
    assert item["videos"].dtype == np.uint8
