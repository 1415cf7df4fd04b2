"""Numerical parity: repo losses vs the ACTUAL reference torch implementations
(reference: utils/loss/contrastive.py:108-319, utils/loss/losses.py:334-555)
on shared random inputs. Values agree to <=1e-5 relative; gradients wrt the
embeddings agree to <=1e-5 absolute.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.losses.contrastive import (
    clip_loss,
    siglip_multi_positive_loss,
)
from deepcoro_clip_tpu.losses import heads as jheads

RTOL = 1e-5
ATOL = 1e-6


def _emb(rng, n, d):
    return rng.normal(size=(n, d)).astype(np.float32)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


# --------------------------------------------------------------------- #
# (a) CLIPLoss
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_clip_loss_value_parity(reference, rng, smoothing):
    from utils.loss.contrastive import CLIPLoss

    v, t = _emb(rng, 12, 32), _emb(rng, 12, 32)
    log_temp = -1.3
    ref = CLIPLoss(label_smoothing=smoothing)(
        torch.tensor(v), torch.tensor(t), torch.tensor(log_temp)
    ).item()
    ours = float(clip_loss(jnp.asarray(v), jnp.asarray(t),
                           jnp.float32(log_temp),
                           label_smoothing=smoothing)["loss"])
    assert ours == pytest.approx(ref, rel=RTOL)


def test_clip_loss_temperature_clamp_parity(reference, rng):
    """temp = exp(log_temp).clamp(min=1e-4) (reference :150-152)."""
    from utils.loss.contrastive import CLIPLoss

    v, t = _emb(rng, 8, 16), _emb(rng, 8, 16)
    log_temp = -20.0  # exp() = 2e-9 -> clamps to 1e-4 on both sides
    ref = CLIPLoss()(torch.tensor(v), torch.tensor(t),
                     torch.tensor(log_temp)).item()
    ours = float(clip_loss(jnp.asarray(v), jnp.asarray(t),
                           jnp.float32(log_temp))["loss"])
    assert ours == pytest.approx(ref, rel=1e-4)


def test_clip_loss_grad_parity(reference, rng):
    from utils.loss.contrastive import CLIPLoss

    v, t = _emb(rng, 10, 24), _emb(rng, 10, 24)
    vt = torch.tensor(v, requires_grad=True)
    tt = torch.tensor(t, requires_grad=True)
    lt = torch.tensor(-1.0, requires_grad=True)
    CLIPLoss()(vt, tt, lt).backward()

    g = jax.grad(
        lambda a, b, c: clip_loss(a, b, c)["loss"], argnums=(0, 1, 2)
    )(jnp.asarray(v), jnp.asarray(t), jnp.float32(-1.0))
    np.testing.assert_allclose(np.asarray(g[0]), vt.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g[1]), tt.grad.numpy(), atol=1e-5)
    assert float(g[2]) == pytest.approx(lt.grad.item(), abs=1e-5)


# --------------------------------------------------------------------- #
# (b) SigLIP family
# --------------------------------------------------------------------- #


def _ref_siglip(reference_mod, v, t, log_temp, bias, pos_mask=None,
                pos_weights=None, **kw):
    loss = reference_mod.SigLIPLoss(bias_init=bias, learnable_bias=False, **kw)
    args = [torch.tensor(v), torch.tensor(t), torch.tensor(log_temp)]
    if pos_mask is not None:
        args.append(torch.tensor(pos_mask))
    if pos_weights is not None:
        args.append(torch.tensor(pos_weights))
    return loss(*args).item()


def _ours_siglip(v, t, log_temp, bias, pos_mask, **kw):
    return float(siglip_multi_positive_loss(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(pos_mask),
        jnp.float32(log_temp), jnp.float32(bias), **kw)["loss"])


def test_siglip_diagonal_parity(reference, rng):
    """Default bias -10, +-30 clamp, diagonal targets (reference :171-319)."""
    import utils.loss.contrastive as ref

    v, t = _emb(rng, 9, 20), _emb(rng, 9, 20)
    expected = _ref_siglip(ref, v, t, -1.0, -10.0)
    got = _ours_siglip(v, t, -1.0, -10.0, np.eye(9, dtype=np.float32))
    assert got == pytest.approx(expected, rel=RTOL)


def test_siglip_logit_clamp_parity(reference, rng):
    """log_temp very negative -> temp clamps at 1e-4 -> logits hit the +-30
    clamp on both implementations."""
    import utils.loss.contrastive as ref

    v, t = _emb(rng, 6, 12), _emb(rng, 6, 12)
    expected = _ref_siglip(ref, v, t, -14.0, -10.0)
    got = _ours_siglip(v, t, -14.0, -10.0, np.eye(6, dtype=np.float32))
    assert got == pytest.approx(expected, rel=1e-4)


def test_siglip_multi_positive_severity_weights_parity(reference, rng):
    """pos_mask [B, T] with multiple positives + per-pair severity weights
    (reference :285-300: positive_contrib = pos_weights * positive_weight)."""
    import utils.loss.contrastive as ref

    B, T, D = 8, 14, 16
    v, t = _emb(rng, B, D), _emb(rng, T, D)
    pos = (rng.random((B, T)) < 0.25).astype(np.float32)
    pos[np.arange(B), rng.integers(0, T, B)] = 1.0  # >=1 positive per row
    w = rng.uniform(0.5, 8.0, size=(B, T)).astype(np.float32)
    expected = _ref_siglip(ref, v, t, -0.7, -10.0, pos_mask=pos,
                           pos_weights=w, use_severity_weights=True,
                           positive_weight=1.25, negative_weight=0.9)
    got = _ours_siglip(v, t, -0.7, -10.0, pos,
                       positive_weights=w, positive_loss_weight=1.25,
                       negative_loss_weight=0.9)
    assert got == pytest.approx(expected, rel=RTOL)


def test_siglip_auto_balance_parity(reference, rng):
    """auto_balance: positive weights REPLACED by the per-row neg/pos ratio,
    clamped >= 1 (reference :293-300)."""
    import utils.loss.contrastive as ref

    B, T, D = 6, 10, 12
    v, t = _emb(rng, B, D), _emb(rng, T, D)
    pos = (rng.random((B, T)) < 0.3).astype(np.float32)
    pos[np.arange(B), np.arange(B)] = 1.0

    expected = _ref_siglip(ref, v, t, -0.7, -10.0, pos_mask=pos,
                           auto_balance=True)
    got = _ours_siglip(v, t, -0.7, -10.0, pos, auto_balance=True)
    assert got == pytest.approx(expected, rel=RTOL)


def test_siglip_entropy_regularization_parity(reference, rng):
    import utils.loss.contrastive as ref
    from deepcoro_clip_tpu.losses.contrastive import entropy_regularization

    B, T, D = 8, 8, 16
    v, t = _emb(rng, B, D), _emb(rng, T, D)
    lossmod = ref.SigLIPLoss(bias_init=-10.0, learnable_bias=False,
                             entropy_regularization=True, entropy_weight=0.3,
                             min_entropy_threshold=2.5)
    expected = lossmod(torch.tensor(v), torch.tensor(t),
                       torch.tensor(-0.7)).item()
    pos = np.eye(B, dtype=np.float32)
    base = _ours_siglip(v, t, -0.7, -10.0, pos)
    logits = _pair_logits(v, t, -0.7, -10.0)
    ours_ent = float(entropy_regularization(jnp.asarray(logits), 0.3, 2.5))
    ref_ent_only = expected - lossmod._last_entropy_diagnostics["bce_loss"]
    # entropy terms agree; totals agree
    assert ours_ent == pytest.approx(ref_ent_only, abs=2e-5)
    assert base + ours_ent == pytest.approx(expected, rel=1e-4)


def _pair_logits(v, t, log_temp, bias):
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    tn = t / np.linalg.norm(t, axis=1, keepdims=True)
    temp = max(np.exp(log_temp), 1e-4)
    return np.clip(vn @ tn.T / temp + bias, -30.0, 30.0)


def _bce(logits, targets, weights):
    p = np.clip(1 / (1 + np.exp(-logits)), 1e-12, 1 - 1e-12)
    per = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    return weights * per


def test_siglip_padded_reduction_matches_unpadded(rng):
    """TPU fixed-shape batches pad the text bank; the count-based reduction
    over VALID pairs must equal the reference's unpadded mean reduction."""
    B, T, D, PAD = 5, 7, 8, 4
    v, t = _emb(rng, B, D), _emb(rng, T, D)
    pos = np.zeros((B, T), np.float32)
    pos[np.arange(B), np.arange(B)] = 1.0

    unpadded = _ours_siglip(v, t, -0.7, -10.0, pos,
                            positive_loss_weight=2.0,
                            negative_loss_weight=0.5)
    t_pad = np.concatenate([t, np.ones((PAD, D), np.float32)], 0)
    pos_pad = np.concatenate([pos, np.zeros((B, PAD), np.float32)], 1)
    valid = np.concatenate([np.ones(T), np.zeros(PAD)]).astype(np.float32)
    padded = _ours_siglip(v, t_pad, -0.7, -10.0, pos_pad,
                          positive_loss_weight=2.0, negative_loss_weight=0.5,
                          text_valid=valid)
    assert padded == pytest.approx(unpadded, rel=1e-6)


# --------------------------------------------------------------------- #
# (c) focal / per-head losses / MultiHead
# --------------------------------------------------------------------- #


def test_multiclass_focal_parity(reference, rng):
    from utils.loss.losses import MultiClassFocalLoss

    logits = rng.normal(size=(16, 5)).astype(np.float32)
    target = rng.integers(0, 5, 16)
    ref = MultiClassFocalLoss(gamma=2.0)(
        torch.tensor(logits), torch.tensor(target)).item()
    ours = float(jheads.multiclass_focal_loss(
        jnp.asarray(logits), jnp.asarray(target), gamma=2.0))
    assert ours == pytest.approx(ref, rel=RTOL)


def test_binary_focal_parity(reference, rng):
    from utils.loss.losses import BinaryFocalLoss

    logits = rng.normal(size=(32,)).astype(np.float32)
    target = rng.integers(0, 2, 32).astype(np.float32)
    loss = BinaryFocalLoss(alpha=0.25, gamma=2.0)
    # reference computes bce_loss via attribute set in subclasses; replicate
    # its functional path
    loss.bce_loss = torch.nn.BCEWithLogitsLoss(reduction="none")
    ref = loss(torch.tensor(logits), torch.tensor(target)).item()
    ours = float(jheads.binary_focal_loss(
        jnp.asarray(logits), jnp.asarray(target), gamma=2.0, alpha=0.25))
    assert ours == pytest.approx(ref, rel=RTOL)


@pytest.mark.parametrize("name,ref_cls,kwargs", [
    ("mse", "MSELoss", {}),
    ("mae", "MAELoss", {}),
    ("rmse", "RMSELoss", {}),
    ("huber", "HuberLoss", {}),
])
def test_regression_loss_parity(reference, rng, name, ref_cls, kwargs):
    """Defaults included: reference HuberLoss delta defaults to 0.1
    (utils/loss/losses.py:347-358) — the repo default must match."""
    import utils.loss.losses as ref

    pred = rng.normal(size=(24,)).astype(np.float32)
    target = rng.normal(size=(24,)).astype(np.float32)
    expected = getattr(ref, ref_cls)(**kwargs)(
        torch.tensor(pred), torch.tensor(target)).item()
    fn = getattr(jheads, f"{name}_loss")
    got = float(fn(jnp.asarray(pred), jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=RTOL)


def test_ce_and_bce_parity(reference, rng):
    import utils.loss.losses as ref

    logits = rng.normal(size=(16, 4)).astype(np.float32)
    target = rng.integers(0, 4, 16)
    expected = ref.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(target)).item()
    got = float(jheads.ce_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=RTOL)

    blog = rng.normal(size=(16,)).astype(np.float32)
    btar = rng.integers(0, 2, 16).astype(np.float32)
    expected_b = ref.BCEWithLogitsLoss()(
        torch.tensor(blog), torch.tensor(btar)).item()
    got_b = float(jheads.bce_logit_loss(jnp.asarray(blog), jnp.asarray(btar)))
    assert got_b == pytest.approx(expected_b, rel=RTOL)


def test_multi_head_loss_parity(reference, rng):
    """Weighted multi-head total + per-head values
    (reference MultiHeadLoss, utils/loss/losses.py:477-555)."""
    from utils.loss.losses import MultiHeadLoss

    B = 12
    outputs_np = {
        "stenosis": rng.normal(size=(B, 1)).astype(np.float32),
        "vessel": rng.normal(size=(B, 4)).astype(np.float32),
        "abnormal": rng.normal(size=(B, 1)).astype(np.float32),
    }
    targets_np = {
        "stenosis": rng.normal(size=(B,)).astype(np.float32),
        "vessel": rng.integers(0, 4, B),
        "abnormal": rng.integers(0, 2, B).astype(np.float32),
    }
    structure = {"stenosis": 1, "vessel": 4, "abnormal": 1}
    loss_structure = {"stenosis": "mse", "vessel": "ce", "abnormal": "bce_logit"}
    head_weights = {"stenosis": 2.0, "vessel": 1.0, "abnormal": 0.5}

    ref = MultiHeadLoss(head_structure=structure,
                        loss_structure=loss_structure,
                        head_weights=head_weights)
    # reference MSE flattens outputs via .view(-1); CE squeezes
    ref_losses = ref({k: torch.tensor(x) for k, x in outputs_np.items()},
                     {k: torch.tensor(x) for k, x in targets_np.items()})
    ours = jheads.multi_head_loss(
        {k: jnp.asarray(x) for k, x in outputs_np.items()},
        {k: jnp.asarray(x) for k, x in targets_np.items()},
        loss_structure=loss_structure, head_weights=head_weights,
    )
    for head in structure:
        assert float(ours[head]) == pytest.approx(
            ref_losses[head].item(), rel=RTOL), head
    assert float(ours["main"]) == pytest.approx(
        ref_losses["main"].item(), rel=RTOL)


def test_weighted_siglip_parity(reference, rng):
    """The reference WeightedSigLIPLoss is a bidirectional weighted
    log-softmax reduction over sim/temp (utils/loss/weighted_siglip.py:38-51),
    fed positive_weights = targets * per-pair weights
    (runners/video_constrative_learning_runner.py:1275-1283)."""
    from utils.loss.weighted_siglip import WeightedSigLIPLoss

    from deepcoro_clip_tpu.losses.contrastive import (
        l2_normalize, weighted_siglip_loss,
    )

    B, M, D = 7, 11, 16
    v, t = _emb(rng, B, D), _emb(rng, M, D)
    pos = (rng.random((B, M)) < 0.3).astype(np.float32)
    pos[np.arange(B), rng.integers(0, M, B)] = 1.0
    w = rng.uniform(0.5, 4.0, size=(B, M)).astype(np.float32)
    log_temp = -0.9

    vn = np.asarray(l2_normalize(jnp.asarray(v)))
    tn = np.asarray(l2_normalize(jnp.asarray(t)))
    logits = torch.tensor(vn @ tn.T / np.exp(log_temp))
    expected = WeightedSigLIPLoss()(logits, torch.tensor(pos * w)).item()

    got = float(weighted_siglip_loss(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(pos),
        jnp.float32(log_temp), positive_weights=jnp.asarray(w))["loss"])
    assert got == pytest.approx(expected, rel=1e-5)


def test_weighted_siglip_padded_matches_unpadded(rng):
    from deepcoro_clip_tpu.losses.contrastive import weighted_siglip_loss

    B, M, D, PAD = 5, 9, 12, 3
    v, t = _emb(rng, B, D), _emb(rng, M, D)
    pos = np.zeros((B, M), np.float32)
    pos[np.arange(B), np.arange(B)] = 1.0
    base = float(weighted_siglip_loss(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(pos),
        jnp.float32(-0.9))["loss"])
    t_pad = np.concatenate([t, np.ones((PAD, D), np.float32)], 0)
    pos_pad = np.concatenate([pos, np.zeros((B, PAD), np.float32)], 1)
    valid = np.concatenate([np.ones(M), np.zeros(PAD)]).astype(np.float32)
    padded = float(weighted_siglip_loss(
        jnp.asarray(v), jnp.asarray(t_pad), jnp.asarray(pos_pad),
        jnp.float32(-0.9), text_valid=jnp.asarray(valid))["loss"])
    assert padded == pytest.approx(base, rel=1e-6)
