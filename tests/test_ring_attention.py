"""Ring attention (sequence parallelism) vs the single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.ops.attention import multi_head_attention
from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
from deepcoro_clip_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(MeshSpec(data=1, model=8))


def test_ring_matches_oracle(mesh8):
    r = np.random.default_rng(0)
    B, H, L, Dh = 2, 2, 64, 16  # 8 tokens per device
    q, k, v = (jnp.asarray(r.normal(size=(B, H, L, Dh)).astype(np.float32))
               for _ in range(3))
    got = ring_attention(q, k, v, mesh8, axis="model")
    want = multi_head_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_ring_is_sharded_and_differentiable(mesh8):
    r = np.random.default_rng(1)
    B, H, L, Dh = 1, 2, 32, 8
    q, k, v = (jnp.asarray(r.normal(size=(B, H, L, Dh)).astype(np.float32))
               for _ in range(3))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh8, axis="model") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------------- #
# Pallas RDMA transport (run under the Pallas TPU interpreter on the CPU mesh)
# --------------------------------------------------------------------------- #


def test_rdma_ring_matches_oracle(mesh8):
    r = np.random.default_rng(2)
    B, H, L, Dh = 2, 2, 64, 16
    q, k, v = (jnp.asarray(r.normal(size=(B, H, L, Dh)).astype(np.float32))
               for _ in range(3))
    got = ring_attention(q, k, v, mesh8, axis="model",
                         backend="rdma_interpret")
    want = multi_head_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_rdma_ring_gradients_via_xla_ring(mesh8):
    r = np.random.default_rng(3)
    B, H, L, Dh = 1, 2, 32, 8
    q, k, v = (jnp.asarray(r.normal(size=(B, H, L, Dh)).astype(np.float32))
               for _ in range(3))

    def loss_rdma(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh8, axis="model",
                                      backend="rdma_interpret") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v) ** 2)

    gr = jax.grad(loss_rdma, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_rdma_ring_single_device():
    mesh1 = make_mesh(MeshSpec(data=8, model=1))
    r = np.random.default_rng(4)
    q, k, v = (jnp.asarray(r.normal(size=(1, 2, 16, 8)).astype(np.float32))
               for _ in range(3))
    got = ring_attention(q, k, v, mesh1, axis="model",
                         backend="rdma_interpret")
    want = multi_head_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

# multi-second jit-compile tests on the CPU harness: fast-path
# excluded (pass --runslow)
pytestmark = pytest.mark.slow
