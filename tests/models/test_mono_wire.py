"""Grayscale H2D wire (config.mono_wire): a 1-channel luma plane against
the 3-channel parameter tree must match the RGB wire exactly on
grayscale-replicated inputs — the channel replication folds into the
patchify weights (models/layers._PatchProj), so checkpoints stay
interchangeable while the wire ships a third of the bytes.

The reference loads grayscale DICOM luma replicated to RGB
(reference: utils/video.py:247-288), so angiography sources are exactly
this case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.models.layers import PatchEmbed3D

MEAN = (110.5, 98.2, 101.0)
STD = (37.8, 41.2, 39.9)


def _gray_rgb(rng, shape):
    """uint8 clip whose three channels are identical (luma replicated)."""
    luma = rng.integers(0, 255, size=shape + (1,)).astype(np.uint8)
    return np.repeat(luma, 3, axis=-1), luma


@pytest.fixture(scope="module")
def setup():
    pe = PatchEmbed3D(dim=32, patch=(2, 8, 8), dtype=jnp.float32,
                      pixel_mean=MEAN, pixel_std=STD)
    rgb, luma = _gray_rgb(np.random.default_rng(0), (2, 4, 16, 16))
    params = pe.init(jax.random.PRNGKey(0), jnp.asarray(rgb))
    return pe, params, rgb, luma


def test_mono_matches_rgb_raw_wire(setup):
    """Raw uint8: folded mono == folded RGB on grayscale-replicated input."""
    pe, params, rgb, luma = setup
    y_rgb, thw = pe.apply(params, jnp.asarray(rgb))
    y_mono, thw2 = pe.apply(params, jnp.asarray(luma))
    assert thw == thw2
    np.testing.assert_allclose(np.asarray(y_mono), np.asarray(y_rgb),
                               rtol=2e-5, atol=2e-4)


def test_mono_param_tree_unchanged(setup):
    """The mono wire reads the SAME 3-channel kernel (checkpoint compat)."""
    pe, params, rgb, luma = setup
    k = params["params"]["conv"]["kernel"]
    assert k.shape == (2, 8, 8, 3, 32)
    p2 = pe.init(jax.random.PRNGKey(0), jnp.asarray(luma))
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: a.shape == b.shape, params, p2))


def test_mono_float_wire_matches(setup):
    """Float path (linear probing normalizes on-device first): a
    channel-uniformly normalized mono plane matches normalized RGB."""
    pe, params, rgb, luma = setup
    m = jnp.asarray(MEAN, jnp.float32)
    s = jnp.asarray(STD, jnp.float32)
    # channel-uniform stats (the wire's contract: stats computed FROM a
    # grayscale-replicated source are identical per channel)
    mu, su = m[:1], s[:1]
    y_rgb, _ = pe.apply(params, (jnp.asarray(rgb, jnp.float32) - mu) / su)
    y_mono, _ = pe.apply(params, (jnp.asarray(luma, jnp.float32) - mu) / su)
    np.testing.assert_allclose(np.asarray(y_mono), np.asarray(y_rgb),
                               rtol=2e-5, atol=2e-4)


def test_mono_stats_broadcast_one_element():
    """Stats computed from a mono dataset (1 element) broadcast against the
    3-channel tree; on uniform data this equals per-channel stats."""
    pe3 = PatchEmbed3D(dim=16, patch=(2, 8, 8), dtype=jnp.float32,
                       pixel_mean=MEAN, pixel_std=STD)
    pe1 = PatchEmbed3D(dim=16, patch=(2, 8, 8), dtype=jnp.float32,
                       pixel_mean=(110.5,), pixel_std=(37.8,))
    rgb, luma = _gray_rgb(np.random.default_rng(2), (1, 2, 8, 8))
    params = pe3.init(jax.random.PRNGKey(1), jnp.asarray(rgb))
    uni = PatchEmbed3D(dim=16, patch=(2, 8, 8), dtype=jnp.float32,
                       pixel_mean=(110.5,) * 3, pixel_std=(37.8,) * 3)
    y_uni, _ = uni.apply(params, jnp.asarray(luma))
    y_one, _ = pe1.apply(params, jnp.asarray(luma))
    np.testing.assert_allclose(np.asarray(y_one), np.asarray(y_uni),
                               rtol=1e-6, atol=1e-5)


def test_mono_patch_wire_matches_grid():
    """Host patch-major mono wire ([B, L, pt*ph*pw*1]) == mono grid path."""
    from deepcoro_clip_tpu.data.patch_wire import patchify_videos

    pe = PatchEmbed3D(dim=16, patch=(2, 8, 8), dtype=jnp.float32,
                      pixel_mean=MEAN, pixel_std=STD, patch_grid=(2, 2, 2))
    _, luma = _gray_rgb(np.random.default_rng(3), (1, 4, 16, 16))
    params = pe.init(jax.random.PRNGKey(2), jnp.asarray(luma))
    y_grid, _ = pe.apply(params, jnp.asarray(luma))
    flat = patchify_videos(luma, (2, 8, 8))
    assert flat.shape == (1, 8, 2 * 8 * 8 * 1)
    y_wire, _ = pe.apply(params, jnp.asarray(flat))
    np.testing.assert_allclose(np.asarray(y_wire), np.asarray(y_grid),
                               rtol=2e-5, atol=2e-4)


def test_video_encoder_mono_matches_rgb():
    """Full tower: embeddings from the mono wire match the RGB wire."""
    from deepcoro_clip_tpu.models.video_encoder import VideoEncoder

    enc = VideoEncoder(embedding_dim=24, backbone_dim=32, depth=1,
                       backbone_heads=2, num_heads=2, patch=(2, 8, 8),
                       dtype=jnp.float32, pixel_mean=MEAN, pixel_std=STD,
                       use_flash=False)
    rgb, luma = _gray_rgb(np.random.default_rng(4), (2, 4, 16, 16))
    params = enc.init(jax.random.PRNGKey(3), jnp.asarray(rgb))
    y_rgb = enc.apply(params, jnp.asarray(rgb), deterministic=True)
    y_mono = enc.apply(params, jnp.asarray(luma), deterministic=True)
    np.testing.assert_allclose(np.asarray(y_mono), np.asarray(y_rgb),
                               rtol=1e-4, atol=1e-4)


def test_dataset_mono_wire_shapes(tmp_path):
    """VideoClipDataset(mono_wire=True) emits [..., 1] uint8 clips."""
    import pandas as pd

    from deepcoro_clip_tpu.data.datasets import VideoClipDataset

    rgb, _ = _gray_rgb(np.random.default_rng(5), (8, 32, 32))
    vid = tmp_path / "clip.npy"
    np.save(vid, rgb)
    csv = tmp_path / "data.csv"
    pd.DataFrame({"FileName": [str(vid)], "Report": ["normal"],
                  "Split": ["train"]}).to_csv(csv, sep="α", index=False)
    ds = VideoClipDataset(str(csv), frames=4, resize=16,
                          wire_dtype="uint8", mono_wire=True)
    item = ds[0]
    assert item["videos"].shape == (1, 4, 16, 16, 1)
    assert item["videos"].dtype == np.uint8
    # and the pixels equal channel 0 of the RGB pipeline
    ds3 = VideoClipDataset(str(csv), frames=4, resize=16, wire_dtype="uint8")
    np.testing.assert_array_equal(item["videos"][..., 0],
                                  ds3[0]["videos"][..., 0])
