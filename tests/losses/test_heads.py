import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.losses.heads import (
    bce_logit_loss,
    binary_focal_loss,
    ce_loss,
    huber_loss,
    mae_loss,
    mse_loss,
    multi_head_loss,
    rmse_loss,
)


def test_regression_losses_zero_at_perfect():
    p = jnp.asarray([1.0, 2.0, 3.0])
    for fn in (mse_loss, mae_loss, huber_loss):
        assert float(fn(p, p)) == pytest.approx(0.0, abs=1e-6)
    assert float(rmse_loss(p, p)) == pytest.approx(0.0, abs=1e-5)


def test_huber_transitions():
    p = jnp.asarray([0.0])
    # |err| < delta: quadratic; beyond: linear
    small = float(huber_loss(p, jnp.asarray([0.5]), delta=1.0))
    assert small == pytest.approx(0.125, abs=1e-6)
    big = float(huber_loss(p, jnp.asarray([3.0]), delta=1.0))
    assert big == pytest.approx(0.5 + 1.0 * 2.0, abs=1e-6)


def test_bce_matches_analytic():
    logits = jnp.asarray([0.0, 2.0])
    targets = jnp.asarray([1.0, 0.0])
    want = np.mean([np.log(2.0), 2.0 + np.log1p(np.exp(-2.0))])
    assert float(bce_logit_loss(logits, targets)) == pytest.approx(want, rel=1e-5)


def test_ce_loss_picks_right_class():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    good = float(ce_loss(logits, jnp.asarray([0, 1])))
    bad = float(ce_loss(logits, jnp.asarray([2, 2])))
    assert good < 0.01 < bad


def test_focal_downweights_easy_examples():
    easy = jnp.asarray([5.0])   # confident correct
    hard = jnp.asarray([-5.0])  # confident wrong
    t = jnp.asarray([1.0])
    assert float(binary_focal_loss(easy, t)) < float(binary_focal_loss(hard, t))


def test_sample_mask_excludes_padding():
    p = jnp.asarray([1.0, 100.0])
    t = jnp.asarray([1.0, 0.0])
    m = jnp.asarray([1.0, 0.0])
    assert float(mse_loss(p, t, sample_mask=m)) == pytest.approx(0.0, abs=1e-6)


def test_multi_head_loss_weighted_sum():
    outputs = {"a": jnp.asarray([1.0]), "b": jnp.asarray([[3.0, 0.0]])}
    targets = {"a": jnp.asarray([0.0]), "b": jnp.asarray([0])}
    losses = multi_head_loss(
        outputs, targets,
        loss_structure={"a": "mse", "b": "ce"},
        head_weights={"a": 2.0, "b": 1.0},
    )
    assert float(losses["main"]) == pytest.approx(
        2.0 * float(losses["a"]) + float(losses["b"]), rel=1e-6
    )


def test_multi_head_loss_singleton_alignment():
    """[B,1] head logits vs [B] targets must NOT broadcast to [B,B]
    (regression test: MIL heads emit [B,1])."""
    p2d = jnp.asarray([[1.0], [3.0]])
    p1d = jnp.asarray([1.0, 3.0])
    t = jnp.asarray([0.0, 1.0])
    l2 = multi_head_loss({"h": p2d}, {"h": t}, {"h": "mse"})["h"]
    l1 = multi_head_loss({"h": p1d}, {"h": t}, {"h": "mse"})["h"]
    assert float(l2) == pytest.approx(float(l1))
    assert float(l2) == pytest.approx((1.0 + 4.0) / 2)
