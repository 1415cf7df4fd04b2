"""Normalization folded into the patchify weights must match host-side
normalize + float path (uint8 wire: models/layers._PatchProj fold)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.models.layers import PatchEmbed3D

MEAN = (110.5, 98.2, 101.0)
STD = (37.8, 41.2, 39.9)


@pytest.fixture(scope="module")
def setup():
    pe = PatchEmbed3D(dim=32, patch=(2, 8, 8), dtype=jnp.float32,
                      pixel_mean=MEAN, pixel_std=STD)
    u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, size=(2, 4, 16, 16, 3)),
        jnp.uint8,
    )
    params = pe.init(jax.random.PRNGKey(0), u8)
    return pe, params, u8


def test_fold_matches_host_normalize(setup):
    pe, params, u8 = setup
    y_raw, thw = pe.apply(params, u8)
    m = jnp.asarray(MEAN, jnp.float32)
    s = jnp.asarray(STD, jnp.float32)
    normed = (u8.astype(jnp.float32) - m) / s
    y_norm, thw2 = pe.apply(params, normed)
    assert thw == thw2
    np.testing.assert_allclose(np.asarray(y_raw), np.asarray(y_norm),
                               rtol=2e-5, atol=2e-4)


def test_no_stats_raw_equals_plain_pixels(setup):
    """Without stats, a raw uint8 batch behaves as mean 0 / std 1."""
    pe = PatchEmbed3D(dim=32, patch=(2, 8, 8), dtype=jnp.float32)
    u8 = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, size=(1, 4, 16, 16, 3)),
        jnp.uint8,
    )
    params = pe.init(jax.random.PRNGKey(0), u8)
    y_raw, _ = pe.apply(params, u8)
    y_float, _ = pe.apply(params, u8.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y_raw), np.asarray(y_float),
                               rtol=1e-5, atol=1e-4)


def test_float_input_ignores_fold(setup):
    """Float (host-normalized) inputs must NOT be re-normalized."""
    pe, params, u8 = setup
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 4, 16, 16, 3)), jnp.float32
    )
    y, _ = pe.apply(params, x)
    pe_plain = PatchEmbed3D(dim=32, patch=(2, 8, 8), dtype=jnp.float32)
    y2, _ = pe_plain.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)
