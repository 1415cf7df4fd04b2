"""Multitask loss: contrastive + captioning CE + MVM MSE with scheduled
weights.

Behavioral parity with the reference ``MultitaskLoss`` + ``LossWeightScheduler``
(reference: utils/loss/multitask_loss.py:17-430): weighted task sum,
label-smoothed captioning cross-entropy on shift-by-one targets
(runners/multitask_runner.py:809-820), step-scheduled task weights
(:338-430), and per-sample stenosis-severity loss weights from report text
(_compute_stenosis_losses:165-230 — host-side via StenosisExtractor, passed
in as an array).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


def captioning_loss(
    logits: jax.Array,           # [B, L, V] (predicts token at same position+1)
    target_ids: jax.Array,       # [B, L]
    attention_mask: jax.Array,   # [B, L] 1 = real token
    label_smoothing: float = 0.1,
    sample_weights: Optional[jax.Array] = None,  # [B]
) -> jax.Array:
    """Shift-by-one CE: logits[:, :-1] predict target_ids[:, 1:]."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = target_ids[:, 1:]
    mask = attention_mask[:, 1:].astype(jnp.float32)
    nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), -1)[..., 0]
    if label_smoothing > 0:
        nll = (1 - label_smoothing) * nll - label_smoothing * logp.mean(-1)
    if sample_weights is not None:
        mask = mask * sample_weights[:, None].astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def multitask_loss(
    task_losses: Dict[str, jax.Array],
    weights: Dict[str, float],
) -> Dict[str, jax.Array]:
    total = jnp.float32(0.0)
    out = dict(task_losses)
    for name, loss in task_losses.items():
        total = total + float(weights.get(name, 1.0)) * loss
    out["total"] = total
    return out


class LossWeightScheduler:
    """Step-scheduled task weights (reference :338-430).

    schedule: {task: [[step, weight], ...]} — piecewise-constant from the
    last breakpoint <= current step; tasks absent fall back to base weights.
    """

    def __init__(self, base: Dict[str, float],
                 schedule: Optional[Dict[str, List[List[float]]]] = None):
        self.base = dict(base)
        self.schedule = schedule or {}

    def at(self, step: int) -> Dict[str, float]:
        out = dict(self.base)
        for task, points in self.schedule.items():
            w = out.get(task, 1.0)
            for s, v in sorted(points):
                if step >= s:
                    w = float(v)
            out[task] = w
        return out
