"""Deterministic seeding.

The reference seeds torch/numpy/random and forces cudnn determinism
(reference: utils/seed.py:6-22). On TPU/JAX, determinism comes from explicit
threaded PRNG keys; we still seed numpy/python for host-side sampling code
(data augmentation choices, samplers).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def fold_epoch(key: jax.Array, epoch: int) -> jax.Array:
    """Derive a per-epoch key (replaces sampler.set_epoch, reference:
    runners/video_constrative_learning_runner.py:342-345)."""
    return jax.random.fold_in(key, epoch)


def worker_seed(base_seed: int, worker_id: int) -> int:
    """Per-worker host seed (reference: utils/seed.py seed_worker; val loaders
    pin 42+worker_id, reference: dataloaders/video_clip_dataset.py:1050-1059)."""
    return (base_seed + worker_id) % (2**31)
