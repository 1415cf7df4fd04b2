"""Per-head regression/classification losses + MultiHeadLoss.

Behavioral parity with the reference's loss zoo
(reference: utils/loss/losses.py:334-555): mse/mae/rmse/huber for regression,
bce_logit / ce / focal variants for classification, and a dict-structured
``MultiHeadLoss`` with per-head weights.

All functions take raw logits/predictions and fp32-reduce. Optional
``sample_mask`` supports fixed-shape padded batches (TPU static shapes).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.registry import LossRegistry


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    x = x.astype(jnp.float32)
    if mask is None:
        return x.mean()
    m = mask.astype(jnp.float32)
    while m.ndim < x.ndim:
        m = m[..., None]
    m = jnp.broadcast_to(m, x.shape)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


@LossRegistry.register("mse")
def mse_loss(pred, target, sample_mask=None, **kw):
    return _masked_mean((pred.astype(jnp.float32) - target) ** 2, sample_mask)


@LossRegistry.register("mae")
def mae_loss(pred, target, sample_mask=None, **kw):
    return _masked_mean(jnp.abs(pred.astype(jnp.float32) - target), sample_mask)


@LossRegistry.register("rmse")
def rmse_loss(pred, target, sample_mask=None, **kw):
    return jnp.sqrt(mse_loss(pred, target, sample_mask) + 1e-12)


@LossRegistry.register("huber")
def huber_loss(pred, target, delta: float = 0.1, sample_mask=None, **kw):
    """delta default matches the reference HuberLoss
    (utils/loss/losses.py:347-358)."""
    err = pred.astype(jnp.float32) - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return _masked_mean(0.5 * quad**2 + delta * (abs_err - quad), sample_mask)


@LossRegistry.register("bce_logit", "bce_with_logits", "bce")
def bce_logit_loss(pred, target, pos_weight: Optional[float] = None,
                   sample_mask=None, **kw):
    x = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    per = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if pos_weight is not None:
        per = per * (t * (pos_weight - 1.0) + 1.0)
    return _masked_mean(per, sample_mask)


@LossRegistry.register("ce", "cross_entropy")
def ce_loss(pred, target, label_smoothing: float = 0.0, sample_mask=None, **kw):
    """pred: [B, C] logits; target: [B] int labels."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    n = pred.shape[-1]
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), -1)[..., 0]
    if label_smoothing > 0:
        nll = (1 - label_smoothing) * nll - label_smoothing * logp.mean(-1)
    return _masked_mean(nll, sample_mask)


@LossRegistry.register("binary_focal")
def binary_focal_loss(pred, target, gamma: float = 2.0, alpha: float = 0.25,
                      sample_mask=None, **kw):
    """Reference BinaryFocalLoss (utils/loss/losses.py:334-475)."""
    x = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1 - p) * (1 - t)
    a_t = alpha * t + (1 - alpha) * (1 - t)
    return _masked_mean(a_t * (1 - p_t) ** gamma * bce, sample_mask)


@LossRegistry.register("multiclass_focal")
def multiclass_focal_loss(pred, target, gamma: float = 2.0, sample_mask=None, **kw):
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    tgt = target[..., None].astype(jnp.int32)
    logp_t = jnp.take_along_axis(logp, tgt, -1)[..., 0]
    p_t = jnp.take_along_axis(p, tgt, -1)[..., 0]
    return _masked_mean(-((1 - p_t) ** gamma) * logp_t, sample_mask)


def multi_head_loss(
    outputs: Dict[str, jax.Array],
    targets: Dict[str, jax.Array],
    loss_structure: Dict[str, str],
    head_weights: Optional[Dict[str, float]] = None,
    sample_mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Weighted sum of per-head losses (reference MultiHeadLoss,
    utils/loss/losses.py:478-555). Returns {"main": total, <head>: loss}."""
    losses: Dict[str, jax.Array] = {}
    total = jnp.float32(0.0)
    for head, loss_name in loss_structure.items():
        fn = LossRegistry.get(loss_name)
        pred = outputs[head]
        tgt = targets[head]
        # single-output heads emit [B, 1]; align with [B] targets so the
        # elementwise losses don't broadcast to [B, B]
        if pred.ndim == tgt.ndim + 1 and pred.shape[-1] == 1:
            pred = pred[..., 0]
        lh = fn(pred, tgt, sample_mask=sample_mask)
        losses[head] = lh
        w = (head_weights or {}).get(head, 1.0)
        total = total + w * lh
    losses["main"] = total
    return losses
