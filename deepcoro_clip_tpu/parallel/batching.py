"""Host-batch -> device-batch placement (the H2D boundary).

One shared implementation of the padding+sharding rule used by every train
bundle: the leading (batch) axis is padded to a multiple of the data-mesh
axis (repeat-last rows + a ``sample_mask`` marking real rows), then every
array is placed on the mesh — batch-sharded over ``data`` except the keys in
``replicated_keys`` (e.g. the SigLIP unique-text bank, which is global).

Losses consume ``sample_mask`` so padded rows contribute nothing
(losses/contrastive.py, losses/heads.py). Replaces the reference's
dummy-batch rank-lockstep trick (reference:
runners/video_constrative_learning_runner.py:676-685).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepcoro_clip_tpu.parallel.mesh import DATA_AXIS


def make_batch_sharding_fn(
    mesh: Mesh, replicated_keys: Sequence[str] = ()
) -> Callable[[Dict[str, Any]], Dict[str, Any]]:
    n_data = mesh.shape[DATA_AXIS]
    replicated = frozenset(replicated_keys)

    def put(x, key):
        if isinstance(x, dict):
            return {k: put(v, key) for k, v in x.items()}
        x = np.asarray(x)
        if key in replicated:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(
            x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        )

    def pad_rows(x, n, pad):
        if isinstance(x, dict):
            return {k: pad_rows(v, n, pad) for k, v in x.items()}
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n:
            return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        return x

    def fn(batch: Dict[str, Any]) -> Dict[str, Any]:
        batch = dict(batch)
        n = int(np.asarray(batch["videos"]).shape[0])
        target = int(np.ceil(n / n_data) * n_data)
        mask = np.asarray(batch.get("sample_mask", np.ones((n,), np.float32)))
        if target != n:
            pad = target - n
            batch = {
                k: (v if k in replicated else pad_rows(v, n, pad))
                for k, v in batch.items()
            }
            mask = np.concatenate([mask, np.zeros((pad,), np.float32)])
        batch["sample_mask"] = mask
        return {k: put(v, k) for k, v in batch.items()}

    return fn
