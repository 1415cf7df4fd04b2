"""LocCa (location-aware captioning) losses.

Reference: utils/loss/locca_loss.py — ``LocCaCaptioningLoss`` (:23),
``LocCaReferringExpressionLoss`` (:91), ``LocCaGroundedCaptioningLoss``
(:184), ``LocCaCombinedLoss`` (:286). The three tasks share one decoder and
differ in WHICH target positions are scored:

- captioning: every text token;
- referring expression: only location/coordinate tokens (given the text,
  predict where) — positions flagged by ``location_mask``;
- grounded captioning: only non-location tokens (given locations, predict
  the description).

All are shift-by-one CE over decoder logits, so they compose from the same
masked-CE primitive with different position masks.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.losses.multitask import captioning_loss


def _masked_shift_ce(logits, target_ids, position_mask, label_smoothing=0.0,
                     sample_weights=None):
    """Shift-by-one CE restricted to positions where position_mask==1."""
    return captioning_loss(
        logits, target_ids, position_mask, label_smoothing=label_smoothing,
        sample_weights=sample_weights,
    )


def locca_captioning_loss(
    logits, target_ids, attention_mask, label_smoothing: float = 0.1,
    sample_weights=None,
):
    """Plain captioning CE over all real tokens (reference :23)."""
    return captioning_loss(logits, target_ids, attention_mask, label_smoothing,
                           sample_weights=sample_weights)


def locca_referring_expression_loss(
    logits, target_ids, attention_mask, location_mask,
    label_smoothing: float = 0.0, sample_weights=None,
):
    """Score only location tokens (reference :91). location_mask: [B, L]
    1 = coordinate/location token."""
    mask = attention_mask * location_mask
    return _masked_shift_ce(logits, target_ids, mask, label_smoothing,
                            sample_weights)


def locca_grounded_captioning_loss(
    logits, target_ids, attention_mask, location_mask,
    label_smoothing: float = 0.1, sample_weights=None,
):
    """Score only non-location tokens (reference :184)."""
    mask = attention_mask * (1 - location_mask)
    return _masked_shift_ce(logits, target_ids, mask, label_smoothing,
                            sample_weights)


def locca_combined_loss(
    logits,
    target_ids,
    attention_mask,
    location_mask: Optional[jnp.ndarray] = None,
    weights: Optional[Dict[str, float]] = None,
    label_smoothing: float = 0.1,
    sample_weights=None,
) -> Dict[str, jax.Array]:
    """Weighted sum of the three LocCa tasks (reference :286). Without a
    location mask this degrades to plain captioning."""
    weights = weights or {"captioning": 1.0, "referring": 1.0, "grounded": 1.0}
    out: Dict[str, jax.Array] = {}
    out["captioning"] = locca_captioning_loss(
        logits, target_ids, attention_mask, label_smoothing, sample_weights
    )
    total = weights.get("captioning", 1.0) * out["captioning"]
    if location_mask is not None:
        out["referring"] = locca_referring_expression_loss(
            logits, target_ids, attention_mask, location_mask,
            sample_weights=sample_weights,
        )
        out["grounded"] = locca_grounded_captioning_loss(
            logits, target_ids, attention_mask, location_mask, label_smoothing,
            sample_weights=sample_weights,
        )
        total = (
            total
            + weights.get("referring", 1.0) * out["referring"]
            + weights.get("grounded", 1.0) * out["grounded"]
        )
    out["total"] = total
    return out
