from deepcoro_clip_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
