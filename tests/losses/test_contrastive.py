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


def test_auto_balance_ignores_padded_columns():
    """auto_balance's neg/pos ratio must count VALID text columns only:
    padding the bank from M to M+K (text_valid marking the pads) must not
    change the loss (regression: n_neg used pos.shape[1])."""
    B, M, K, D = 4, 10, 6, 16
    r = np.random.default_rng(1)
    v = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
    t = jnp.asarray(r.normal(size=(M, D)).astype(np.float32))
    pos = (r.random((B, M)) > 0.6).astype(np.float32)
    pos[np.arange(B), np.arange(B)] = 1.0
    base = siglip_multi_positive_loss(
        v, t, jnp.asarray(pos), jnp.log(0.1), jnp.float32(-10.0),
        auto_balance=True,
        text_valid=jnp.ones((M,), jnp.float32),
    )
    t_pad = jnp.concatenate([t, jnp.full((K, D), 7.0)], axis=0)
    pos_pad = jnp.concatenate(
        [jnp.asarray(pos), jnp.zeros((B, K))], axis=1)
    valid = jnp.asarray(np.array([1] * M + [0] * K, np.float32))
    padded = siglip_multi_positive_loss(
        v, t_pad, pos_pad, jnp.log(0.1), jnp.float32(-10.0),
        auto_balance=True, text_valid=valid,
    )
    np.testing.assert_allclose(
        float(base["loss"]), float(padded["loss"]), rtol=1e-6)


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
    """penalty = weight * relu(threshold - mean_entropy): zero once the mean
    row entropy clears the 2.0-nat threshold, positive for peaked rows
    (reference compute_entropy_regularization, utils/loss/contrastive.py:19-72)."""
    from deepcoro_clip_tpu.losses.contrastive import entropy_regularization

    B = 8
    uniform = jnp.zeros((B, B))  # entropy ln(8) = 2.079 > 2.0 threshold
    peaked = 50.0 * jnp.eye(B)
    assert float(entropy_regularization(uniform, 1.0)) == pytest.approx(0.0, abs=1e-5)
    assert float(entropy_regularization(peaked, 1.0)) > 1.0


def test_entropy_reg_zero_above_threshold_not_uniform_push():
    """The penalty must be EXACTLY zero above threshold — it is relu-gated,
    not a constant (max_entropy - entropy) push toward uniform."""
    from deepcoro_clip_tpu.losses.contrastive import entropy_regularization

    B = 32  # max entropy ln(32) = 3.46
    r = np.random.default_rng(0)
    # mildly non-uniform rows: entropy well above 2.0 but below max
    sim = jnp.asarray(0.3 * r.normal(size=(B, B)).astype(np.float32))
    val = float(entropy_regularization(sim, 1.0))
    assert val == 0.0


def test_entropy_reg_ignores_padded_columns():
    """Padded text-bank columns must not count toward the entropy."""
    from deepcoro_clip_tpu.losses.contrastive import entropy_regularization

    B, M = 4, 16
    sim = jnp.zeros((B, M))
    valid = jnp.zeros((M,)).at[:2].set(1.0)  # only 2 real columns
    # entropy over 2 uniform columns = ln(2) = 0.69 < 2.0 -> deficit 1.386
    val = float(entropy_regularization(sim, 1.0, col_mask=valid))
    assert val == pytest.approx(2.0 - np.log(2.0), abs=1e-4)
    # without the mask the 16 uniform columns would clear the threshold
    assert float(entropy_regularization(sim, 1.0)) == pytest.approx(0.0, abs=1e-5)


def test_label_smoothing_finite_with_padded_rows():
    """Label smoothing on a padded batch must stay finite: the uniform term
    averages over VALID columns only, never the NEG_LOGIT padding (round-1
    ADVICE: a padded val batch produced ~1e28 losses)."""
    B, D = 6, 16
    r = np.random.default_rng(0)
    v = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
    t = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
    mask = jnp.asarray(np.array([1, 1, 1, 1, 0, 0], np.float32))
    out = clip_loss(v, t, jnp.log(0.07), label_smoothing=0.1, sample_mask=mask)
    loss = float(out["loss"])
    assert np.isfinite(loss)
    assert loss < 50.0  # sane CE magnitude, not 1e28
    # and it matches the unpadded loss on the valid sub-batch
    ref = clip_loss(v[:4], t[:4], jnp.log(0.07), label_smoothing=0.1)
    assert loss == pytest.approx(float(ref["loss"]), rel=1e-4)
