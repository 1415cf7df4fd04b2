import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.losses.contrastive import (
    clip_loss,
    multi_positive_infonce_loss,
    siglip_multi_positive_loss,
    siglip_pairwise_loss,
)
from deepcoro_clip_tpu.registry import LossRegistry, register_all

register_all()


def _embs(B=8, D=16, seed=0):
    r = np.random.default_rng(seed)
    return (
        jnp.asarray(r.normal(size=(B, D)).astype(np.float32)),
        jnp.asarray(r.normal(size=(B, D)).astype(np.float32)),
    )


def test_clip_loss_perfect_alignment_is_low():
    v, _ = _embs()
    high = clip_loss(v, v, jnp.log(0.05))["loss"]
    v2, t2 = _embs(seed=1)
    rand = clip_loss(v2, t2, jnp.log(0.05))["loss"]
    assert float(high) < float(rand)


def test_clip_loss_symmetric_batch_value():
    """Identity similarity at temp 1: loss == log(B) + small."""
    B = 4
    v = jnp.eye(B, 16)
    out = clip_loss(v, v, jnp.log(1.0))
    assert out["similarity"].shape == (B, B)
    # analytic: softmax over [1,0,0,0]-like rows
    sim = np.asarray(out["similarity"])
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)


def test_clip_loss_gradients_flow_to_both():
    v, t = _embs()
    g = jax.grad(
        lambda v, t, lt: clip_loss(v, t, lt)["loss"], argnums=(0, 1, 2)
    )(v, t, jnp.log(0.07))
    assert all(float(jnp.max(jnp.abs(x))) > 0 for x in g)


def test_registry_keys_resolve():
    for key in ["contrastive", "CLIP", "InfoNCE_Loss_DDP", "siglip_ddp",
                "siglip_pairwise", "siglip2_bce"]:
        assert LossRegistry.get(key) is not None


def test_siglip_pairwise_diagonal_positive():
    v, t = _embs(B=6)
    out = siglip_pairwise_loss(v, t, jnp.log(0.1), jnp.float32(-10.0))
    assert out["similarity"].shape == (6, 6)
    assert np.isfinite(float(out["loss"]))


def test_multi_positive_masks_and_weights():
    B, M, D = 4, 10, 16
    r = np.random.default_rng(0)
    v = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
    t = jnp.asarray(r.normal(size=(M, D)).astype(np.float32))
    pos = jnp.asarray((r.random((B, M)) > 0.7).astype(np.float32))
    w = jnp.asarray(r.uniform(1, 5, (B, M)).astype(np.float32))
    valid = jnp.asarray(np.array([1] * 8 + [0] * 2, np.float32))
    out = siglip_multi_positive_loss(
        v, t, pos, jnp.log(0.1), jnp.float32(-10.0),
        positive_weights=w, text_valid=valid,
    )
    assert np.isfinite(float(out["loss"]))

    # padded text slots must not affect the loss
    t2 = t.at[8:].set(99.0)
    out2 = siglip_multi_positive_loss(
        v, t2, pos, jnp.log(0.1), jnp.float32(-10.0),
        positive_weights=w, text_valid=valid,
    )
    np.testing.assert_allclose(float(out["loss"]), float(out2["loss"]), rtol=1e-6)


def test_multi_positive_perfect_vs_random():
    B, D = 6, 16
    r = np.random.default_rng(3)
    v = jnp.asarray(np.eye(B, D).astype(np.float32))
    pos = jnp.eye(B)
    good = siglip_multi_positive_loss(v, v, pos, jnp.log(0.05), jnp.float32(0.0))
    t = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
    bad = siglip_multi_positive_loss(v, t, pos, jnp.log(0.05), jnp.float32(0.0))
    assert float(good["loss"]) < float(bad["loss"])


def test_multi_positive_infonce():
    B, M, D = 4, 8, 16
    r = np.random.default_rng(0)
    v = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
    t = jnp.asarray(r.normal(size=(M, D)).astype(np.float32))
    pos = jnp.zeros((B, M)).at[:, 0].set(1.0)
    out = multi_positive_infonce_loss(v, t, pos, jnp.log(0.07))
    assert np.isfinite(float(out["loss"]))


def test_entropy_reg_penalizes_peaked_rows():
    """The regularizer is (max_entropy - entropy): zero for uniform
    (collapsed) similarity rows, positive for peaked ones (reference
    compute_entropy_regularization, utils/loss/contrastive.py:19-72)."""
    from deepcoro_clip_tpu.losses.contrastive import entropy_regularization

    B = 8
    uniform = jnp.zeros((B, B))
    peaked = 50.0 * jnp.eye(B)
    assert float(entropy_regularization(uniform, 1.0)) == pytest.approx(0.0, abs=1e-5)
    assert float(entropy_regularization(peaked, 1.0)) > 1.0
