"""Shared runner plumbing: mesh sizing and dataset-stats resolution.

All three runners (contrastive, linear probing, multitask) need the same
two pieces of setup; before this module they each carried a drifting copy
(e.g. linear probing silently lacked the legacy ``data_mean`` fallback).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax

from deepcoro_clip_tpu.data.datasets import StatsDataset
from deepcoro_clip_tpu.parallel.mesh import MeshSpec, make_mesh


def make_runner_mesh(config):
    """2D ("data", "model") mesh sized from a pipeline config.

    The data axis must divide the global batch for exact (unpadded) training
    batches, so it shrinks to gcd(data, batch_size) when needed (reference
    sizes world_size to the batch via torchrun instead, SURVEY.md §2.2).
    """
    model = max(1, config.mesh_model)
    avail = jax.device_count() // model
    data = config.mesh_data if config.mesh_data > 0 else avail
    data = math.gcd(data, config.batch_size) or 1
    return make_mesh(MeshSpec(data=data, model=model))


def resolve_dataset_stats(config, datasets: Dict[str, Optional[Any]]):
    """Dataset mean/std: config override or computed from the train split
    (reference: utils/video_project.py:10-101; inference REQUIRES
    precomputed stats, :38-43).

    Returns ``(mean, std)`` as float lists, writes them back to
    ``config.dataset_mean/std`` (the uint8 wire's on-device normalization
    reads them from the config at bundle-build time), and — on the float32
    wire — pushes them into every dataset for host normalization.
    """
    mean = config.dataset_mean or getattr(config, "data_mean", None)
    std = config.dataset_std or getattr(config, "data_std", None)
    if mean is None:
        train = datasets.get("train")
        if train is None:
            raise ValueError(
                "dataset_mean/dataset_std must be provided for "
                f"run_mode={getattr(config, 'run_mode', None)!r} (reference "
                "requires precomputed stats outside training)"
            )
        mean, std = StatsDataset(train).compute()
        mean, std = mean.tolist(), std.tolist()
    stats = (list(map(float, mean)), list(map(float, std)))
    config.dataset_mean, config.dataset_std = stats
    if config.wire_dtype == "float32":
        for ds in datasets.values():
            if ds is not None:
                ds.mean, ds.std = stats
    return stats
