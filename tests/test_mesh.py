import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from deepcoro_clip_tpu.parallel import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    shard_batch,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    m = make_mesh(MeshSpec(data=4, model=2))
    assert m.shape == {"data": 4, "model": 2}
    m1 = make_mesh()  # all devices on data
    assert m1.shape == {"data": 8, "model": 1}


def test_meshspec_too_big_raises():
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(data=16, model=2))


def test_shard_batch_places_on_data_axis(mesh8):
    batch = {"videos": np.ones((8, 4, 4), np.float32), "ids": np.arange(8)}
    out = shard_batch(batch, mesh8)
    sh = out["videos"].sharding
    assert sh.spec == P("data", None, None)
    np.testing.assert_array_equal(np.asarray(out["ids"]), np.arange(8))


def test_global_matmul_over_sharded_batch(mesh8):
    """The contrastive-matrix pattern: batch-sharded embeddings, global NxN
    similarity — XLA inserts the all_gather (replaces reference GatherLayer,
    utils/loss/losses.py:70-102)."""
    v = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)
    t = np.random.default_rng(1).normal(size=(8, 16)).astype(np.float32)
    vs = jax.device_put(v, batch_sharding(mesh8, 2))
    ts = jax.device_put(t, batch_sharding(mesh8, 2))

    @jax.jit
    def sim(a, b):
        return a @ b.T

    np.testing.assert_allclose(
        np.asarray(sim(vs, ts)), v @ t.T, rtol=1e-4, atol=1e-5
    )
