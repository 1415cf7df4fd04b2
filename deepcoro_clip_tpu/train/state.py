"""Train state + param-sharding utilities."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


@flax.struct.dataclass
class TrainState:
    """Pure-pytree training state (checkpointable with orbax as-is)."""

    step: jax.Array
    params: PyTree
    opt_state: PyTree
    # scalars tracked across the run (reference keeps these in its checkpoint
    # dict, runners/video_constrative_learning_runner.py:1071-1115)
    best_val_loss: jax.Array
    best_epoch: jax.Array


def unbox_with_spec(variables: PyTree) -> tuple[PyTree, PyTree]:
    """Split flax ``nn.Partitioned`` metadata into (plain params, PartitionSpec
    tree). Non-partitioned leaves get a replicated spec."""
    spec = nn.get_partition_spec(variables)
    params = nn.meta.unbox(variables)
    return params, spec


def to_named_shardings(mesh: Mesh, spec_tree: PyTree) -> PyTree:
    def conv(spec):
        if isinstance(spec, P):
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(
        conv, spec_tree, is_leaf=lambda x: isinstance(x, P)
    )


def replicate_state(state: PyTree, mesh: Mesh, spec_tree: Optional[PyTree] = None):
    """Place a host state on the mesh (params per spec, rest replicated)."""
    if spec_tree is None:
        return jax.device_put(state, NamedSharding(mesh, P()))
    shardings = to_named_shardings(mesh, spec_tree)
    return jax.device_put(state, shardings)
