"""Device-mesh construction and sharding helpers.

This module replaces the reference's entire distributed substrate
(reference: utils/ddp.py:11-136 — NCCL process-group init, gather/broadcast
helpers, DDP wrapping). On TPU there is ONE program over a
``jax.sharding.Mesh``:

- data parallelism  = shard the batch axis over mesh axis ``data`` under jit;
  gradient averaging is inserted by XLA automatically (no DDP hooks).
- tensor parallelism = shard attention heads / MLP hidden over mesh axis
  ``model`` via flax param partitioning (new capability; the reference only
  has DDP, SURVEY.md §2.2).
- the global-batch contrastive matrix (reference GatherLayer,
  utils/loss/losses.py:70-102) falls out of writing the loss over the global
  batch: XLA inserts the all_gather over ICI.

Mesh axes: ``("data", "model")``. Sequence/context parallelism can reuse the
"model" axis for the token dimension where needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """How to carve the device grid. ``data * model`` must divide device count
    (remaining devices are dropped only if sizes are explicit)."""

    data: int = -1  # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model > n_devices:
            raise ValueError(
                f"MeshSpec(data={data}, model={model}) needs {data * model} "
                f"devices, have {n_devices}"
            )
        return data, model


def make_mesh(
    spec: MeshSpec | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2D ("data", "model") mesh over the given (or all) devices."""
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding for an array whose leading axis is the global batch."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, Any] | Any, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along the batch axis.

    Every array leaf is sharded on its leading axis over ``data`` and
    replicated elsewhere. This is the H2D boundary (the reference's
    ``.to(device)`` loop, runners/video_constrative_learning_runner.py:687).
    """

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """The slice of the global batch this *process* feeds (multi-host input).

    Single-process (all tests + single-chip bench): the full batch.
    """
    n_data = mesh.shape[DATA_AXIS]
    per_shard = global_batch // n_data
    if global_batch % n_data:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n_data}"
        )
    procs = jax.process_count()
    if procs == 1:
        return slice(0, global_batch)
    per_proc = global_batch // procs
    i = jax.process_index()
    del per_shard
    return slice(i * per_proc, (i + 1) * per_proc)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
