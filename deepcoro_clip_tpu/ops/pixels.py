"""Device-side pixel normalization (the uint8-wire half of the input path).

The reference normalizes on the host inside DataLoader workers
(reference: utils/video.py:278-288) and ships float32 over PCIe. On TPU the
H2D hop (a ~100 ms-latency tunnel on this machine) is the scarce resource, so
batches ride the wire as uint8 (1/4 the bytes) and are normalized here, inside
the jitted step — XLA fuses the subtract/divide into the first convolution's
input, so it costs nothing extra on-chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def normalize_videos(
    videos: jax.Array,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
) -> jax.Array:
    """Normalize integer pixel batches on-device; pass floats through.

    The dtype gate is static at trace time: a float batch means the host
    already normalized (wire_dtype="float32"), an integer batch carries raw
    pixels to be normalized with the dataset statistics here.
    """
    if not jnp.issubdtype(videos.dtype, jnp.integer):
        return videos
    m = jnp.asarray(mean if mean is not None else (0.0, 0.0, 0.0), jnp.float32)
    s = jnp.asarray(std if std is not None else (1.0, 1.0, 1.0), jnp.float32)
    if m.shape[0] > videos.shape[-1]:
        # grayscale wire (config.mono_wire): channel-uniform stats by the
        # wire's contract — any channel's statistics apply to the luma plane
        m, s = m[: videos.shape[-1]], s[: videos.shape[-1]]
    return (videos.astype(jnp.float32) - m) / jnp.maximum(s, 1e-6)


def config_stats(config):
    """(mean, std) for normalize_videos from a pipeline config."""
    mean = getattr(config, "dataset_mean", None) or getattr(config, "data_mean", None)
    std = getattr(config, "dataset_std", None) or getattr(config, "data_std", None)
    return mean, std
