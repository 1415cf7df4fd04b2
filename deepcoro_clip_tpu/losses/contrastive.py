"""Contrastive losses over the GLOBAL batch.

TPU-native translation of the reference's loss family
(reference: utils/loss/contrastive.py, utils/loss/losses.py,
utils/loss/siglip_pairwise.py, utils/loss/siglip2_bce.py):

The reference needs a differentiable all_gather (``GatherLayer``,
utils/loss/losses.py:70-102) so the NxN logit matrix spans the global DDP
batch. Under pjit there is nothing to do: these functions are written over
the global batch; with embeddings sharded on the mesh "data" axis, XLA
inserts the all_gather over ICI and autodiff provides the reduce-scatter
backward. Every loss reduces in fp32 (reference forces fp32 under AMP,
utils/loss/contrastive.py:140).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.registry import LossRegistry

NEG_LOGIT = -1e30


def l2_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _ce_with_smoothing(logits: jax.Array, labels: jax.Array, smoothing: float,
                       row_weights: Optional[jax.Array] = None,
                       col_mask: Optional[jax.Array] = None):
    """CE with label smoothing; ``col_mask`` [C] marks valid columns so the
    uniform smoothing term never averages over NEG_LOGIT-masked padding
    (a padded column contributes ~1e28 to -logp.mean otherwise)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if smoothing > 0.0:
        if col_mask is not None:
            m = col_mask.astype(jnp.float32)[None, :]
            uniform = -jnp.sum(logp * m, axis=-1) / jnp.maximum(m.sum(), 1.0)
        else:
            uniform = -logp.mean(axis=-1)
        nll = (1.0 - smoothing) * nll + smoothing * uniform
    if row_weights is None:
        return nll.mean()
    w = row_weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


@LossRegistry.register(
    "contrastive", "clip", "contrastive_ddp", "infonce_loss", "infonce_loss_ddp",
    "infonce",
)
def clip_loss(
    video_emb: jax.Array,
    text_emb: jax.Array,
    log_temp: jax.Array,
    label_smoothing: float = 0.0,
    sample_mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Bidirectional InfoNCE over the global batch
    (reference CLIPLoss, utils/loss/contrastive.py:108-164).

    video_emb/text_emb: [B, D] (batch-sharded is fine); log_temp: scalar;
    sample_mask: optional [B] (1 = real row) — padded rows are excluded both
    as anchors and as negatives (fixed-shape TPU batches).
    """
    v = l2_normalize(video_emb)
    t = l2_normalize(text_emb)
    temp = jnp.maximum(jnp.exp(log_temp), 1e-4)  # clamp (reference :150)
    sim = (v @ t.T) / temp  # [B, B] global
    labels = jnp.arange(sim.shape[0])
    if sample_mask is not None:
        valid = sample_mask.astype(jnp.float32) > 0
        sim_v = jnp.where(valid[None, :], sim, NEG_LOGIT)
        sim_t = jnp.where(valid[None, :], sim.T, NEG_LOGIT)
        loss_v = _ce_with_smoothing(sim_v, labels, label_smoothing, valid,
                                    col_mask=valid)
        loss_t = _ce_with_smoothing(sim_t, labels, label_smoothing, valid,
                                    col_mask=valid)
    else:
        loss_v = _ce_with_smoothing(sim, labels, label_smoothing)
        loss_t = _ce_with_smoothing(sim.T, labels, label_smoothing)
    loss = 0.5 * (loss_v + loss_t)
    return {"loss": loss, "similarity": sim, "temperature": temp}


@LossRegistry.register("siglip", "siglip_ddp")
def siglip_pairwise_loss(
    video_emb: jax.Array,
    text_emb: jax.Array,
    log_temp: jax.Array,
    bias: jax.Array,
    logit_clamp: float = 30.0,
    sample_mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Square pairwise sigmoid loss, diagonal positives (SigLIP;
    reference SiglipLoss, utils/loss/losses.py:160-276).
    """
    v = l2_normalize(video_emb)
    t = l2_normalize(text_emb)
    temp = jnp.maximum(jnp.exp(log_temp), 1e-4)
    logits = (v @ t.T) / temp + bias
    logits = jnp.clip(logits, -logit_clamp, logit_clamp)
    B = logits.shape[0]
    labels = 2.0 * jnp.eye(B) - 1.0  # +1 diag, -1 off-diag
    per_pair = jax.nn.softplus(-labels * logits)
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)
        w = m[:, None] * m[None, :]
        loss = jnp.sum(per_pair * w) / jnp.maximum(jnp.sum(w), 1.0)
    else:
        loss = jnp.mean(per_pair)
    return {"loss": loss, "similarity": logits, "temperature": temp}


def entropy_regularization(
    sim: jax.Array,
    weight: float,
    min_entropy_threshold: float = 2.0,
    col_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Anti-collapse entropy regularizer over the similarity rows
    (reference compute_entropy_regularization, utils/loss/contrastive.py:19-72):
    penalty = weight * relu(threshold - mean_row_entropy), i.e. zero once the
    mean prediction entropy clears the threshold (2.0 nats default) — it must
    NOT push logits toward uniform at every step.  ``col_mask`` [M] excludes
    padded text-bank columns from the softmax."""
    if weight == 0.0:
        return jnp.float32(0.0)
    if col_mask is not None:
        sim = jnp.where(col_mask.astype(jnp.float32)[None, :] > 0, sim, NEG_LOGIT)
    p = jax.nn.softmax(sim, axis=-1)
    ent = -jnp.sum(p * jnp.log(p + 1e-10), axis=-1).mean()
    return weight * jax.nn.relu(jnp.float32(min_entropy_threshold) - ent)


@LossRegistry.register(
    "siglip_pairwise", "siglip2_bce", "siglip2_bce_ddp", "siglip2_multi_positive",
    "siglip_pairwise_ddp",
)
def siglip_multi_positive_loss(
    video_emb: jax.Array,
    text_emb: jax.Array,
    positive_mask: jax.Array,
    log_temp: jax.Array,
    bias: jax.Array,
    positive_weights: Optional[jax.Array] = None,
    text_valid: Optional[jax.Array] = None,
    positive_loss_weight: float = 1.0,
    negative_loss_weight: float = 1.0,
    logit_clamp: float = 30.0,
    entropy_reg_weight: float = 0.0,
    auto_balance: bool = False,
    sample_mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Multi-positive sigmoid BCE against a unique-text bank.

    video_emb: [B, D]; text_emb: [M, D] (deduped texts of the global batch,
    reference collate: dataloaders/video_clip_dataset.py:843-944);
    positive_mask: [B, M] 1 = positive pair; positive_weights: [B, M]
    per-pair severity weights (reference SigLIPLoss,
    utils/loss/contrastive.py:171-319); text_valid: [M] 0 for padded text
    slots (fixed-shape batching on TPU).
    """
    v = l2_normalize(video_emb)
    t = l2_normalize(text_emb)
    temp = jnp.maximum(jnp.exp(log_temp), 1e-4)
    logits = (v @ t.T) / temp + bias  # [B, M]
    logits = jnp.clip(logits, -logit_clamp, logit_clamp)

    pos = positive_mask.astype(jnp.float32)
    labels = 2.0 * pos - 1.0
    per_pair = jax.nn.softplus(-labels * logits)

    w = jnp.where(pos > 0, positive_loss_weight, negative_loss_weight)
    if positive_weights is not None:
        w = w * jnp.where(pos > 0, positive_weights.astype(jnp.float32), 1.0)
    if auto_balance:
        # per-ROW neg/pos ratio, clamped >= 1, REPLACES the positive weight
        # (reference :293-300: positive_contrib = ratio.expand_as(logits)).
        # Negatives are counted over VALID text columns only: the reference's
        # text bank is unpadded, so padded slots must not inflate the ratio.
        n_pos = jnp.maximum(pos.sum(axis=1, keepdims=True), 1.0)
        n_cols = (text_valid.astype(jnp.float32).sum()
                  if text_valid is not None else float(pos.shape[1]))
        n_neg = jnp.maximum(n_cols - n_pos, 0.0)
        ratio = jnp.maximum(n_neg / n_pos, 1.0)
        w = jnp.where(pos > 0, jnp.broadcast_to(ratio, w.shape),
                      negative_loss_weight)

    # validity of padded slots is separate from the weights: the reference
    # reduces by the PAIR COUNT (BCE reduction="mean", :301-303), not the
    # weight sum — here the count of VALID pairs, identical when unpadded
    valid = jnp.ones_like(per_pair)
    if text_valid is not None:
        valid = valid * text_valid.astype(jnp.float32)[None, :]
    if sample_mask is not None:
        valid = valid * sample_mask.astype(jnp.float32)[:, None]

    loss = jnp.sum(per_pair * w * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    loss = loss + entropy_regularization(
        logits, entropy_reg_weight, col_mask=text_valid
    )
    return {"loss": loss, "similarity": logits, "temperature": temp}


@LossRegistry.register("siglip_single_head")
def siglip_single_head_loss(
    video_emb: jax.Array,
    text_emb: jax.Array,
    positive_mask: jax.Array,
    log_temp: jax.Array,
    bias: jax.Array,
    positive_weights: Optional[jax.Array] = None,
    text_valid: Optional[jax.Array] = None,
    logit_clamp: float = 30.0,
    entropy_reg_weight: float = 0.0,
    sample_mask: Optional[jax.Array] = None,
    **kw,
) -> Dict[str, jax.Array]:
    """Dense-matrix sigmoid loss over the SingleHeadRetrievalSampler's
    (Y, W) output (data/single_head_sampler.py; behavioral spec
    /root/reference/utils/siglip/single_head_sampler.py:174-225): unlike the
    multi-positive BCE — where every valid (video, text) cell is an implicit
    negative — here ``positive_weights`` is the sampler's W matrix and
    weights EVERY sampled pair, positives and negatives alike; W == 0 means
    the pair was not sampled and contributes nothing. Reduction is
    weight-normalized so the sampler's per-bucket weight scales set relative
    pair importance without changing the loss magnitude."""
    v = l2_normalize(video_emb)
    t = l2_normalize(text_emb)
    temp = jnp.maximum(jnp.exp(log_temp), 1e-4)
    logits = (v @ t.T) / temp + bias  # [B, M]
    logits = jnp.clip(logits, -logit_clamp, logit_clamp)

    pos = positive_mask.astype(jnp.float32)
    labels = 2.0 * pos - 1.0
    per_pair = jax.nn.softplus(-labels * logits)

    w = (jnp.maximum(positive_weights.astype(jnp.float32), 0.0)
         if positive_weights is not None else jnp.ones_like(per_pair))
    if text_valid is not None:
        w = w * text_valid.astype(jnp.float32)[None, :]
    if sample_mask is not None:
        w = w * sample_mask.astype(jnp.float32)[:, None]
    loss = jnp.sum(per_pair * w) / jnp.maximum(jnp.sum(w), 1e-6)
    loss = loss + entropy_regularization(
        logits, entropy_reg_weight, col_mask=text_valid
    )
    return {"loss": loss, "similarity": logits, "temperature": temp}


@LossRegistry.register("weighted_siglip")
def weighted_siglip_loss(
    video_emb, text_emb, positive_mask, log_temp, bias=None,
    positive_weights=None, text_valid=None, sample_mask=None, eps=1e-6, **kw,
):
    """Bidirectional weighted multi-positive softmax CE — the reference
    WeightedSigLIPLoss is a log-softmax reduction despite the SigLIP name
    (utils/loss/weighted_siglip.py:38-51), called with logits = sim/temp and
    positive_weights = targets * per-pair weights
    (runners/video_constrative_learning_runner.py:1275-1283). ``bias`` is
    accepted for registry-signature uniformity but unused, exactly like the
    reference's weighted path."""
    v = l2_normalize(video_emb)
    t = l2_normalize(text_emb)
    temp = jnp.maximum(jnp.exp(log_temp), 1e-4)
    logits = (v @ t.T) / temp  # [B, M]

    pos = positive_mask.astype(jnp.float32)
    if positive_weights is not None:
        pos = pos * jnp.maximum(positive_weights.astype(jnp.float32), 0.0)
    col_ok = (text_valid.astype(jnp.float32) if text_valid is not None
              else jnp.ones((logits.shape[1],), jnp.float32))
    row_ok = (sample_mask.astype(jnp.float32) if sample_mask is not None
              else jnp.ones((logits.shape[0],), jnp.float32))
    pos = pos * col_ok[None, :] * row_ok[:, None]
    masked = jnp.where(col_ok[None, :] > 0, logits, NEG_LOGIT)

    logp_v2t = jax.nn.log_softmax(masked, axis=1)
    loss_v2t = -jnp.sum(pos * logp_v2t, axis=1) / jnp.maximum(
        pos.sum(axis=1), eps)
    logp_t2v = jax.nn.log_softmax(
        jnp.where(row_ok[None, :] > 0, logits.T, NEG_LOGIT), axis=1)
    loss_t2v = -jnp.sum(pos.T * logp_t2v, axis=1) / jnp.maximum(
        pos.T.sum(axis=1), eps)

    # row means over VALID rows/cols (identical to the reference's .mean()
    # when unpadded)
    lv = jnp.sum(loss_v2t * row_ok) / jnp.maximum(row_ok.sum(), 1.0)
    lt = jnp.sum(loss_t2v * col_ok) / jnp.maximum(col_ok.sum(), 1.0)
    loss = 0.5 * (lv + lt)
    return {"loss": loss, "similarity": logits, "temperature": temp}


@LossRegistry.register("multi_positive_infonce")
def multi_positive_infonce_loss(
    video_emb, text_emb, positive_mask, log_temp,
    positive_weights=None, text_valid=None, sample_mask=None, **kw,
) -> Dict[str, jax.Array]:
    """Softmax CE spread over multiple positives (reference
    MultiPositiveInfoNCELoss, utils/loss/multi_positive_infonce.py:9-120).
    ``sample_mask`` [B] excludes device-padding duplicate rows, like the
    siglip_* paths."""
    v = l2_normalize(video_emb)
    t = l2_normalize(text_emb)
    temp = jnp.maximum(jnp.exp(log_temp), 1e-4)
    sim = (v @ t.T) / temp
    if text_valid is not None:
        sim = jnp.where(text_valid[None, :] > 0, sim, -1e30)
    logp = jax.nn.log_softmax(sim, axis=-1)
    pos = positive_mask.astype(jnp.float32)
    if positive_weights is not None:
        pos = pos * positive_weights.astype(jnp.float32)
    row_pos = jnp.maximum(pos.sum(axis=-1), 1e-6)
    loss = -(jnp.sum(pos * logp, axis=-1) / row_pos)
    has_pos = (positive_mask.sum(axis=-1) > 0).astype(jnp.float32)
    if sample_mask is not None:
        has_pos = has_pos * sample_mask.astype(jnp.float32)
    loss = jnp.sum(loss * has_pos) / jnp.maximum(jnp.sum(has_pos), 1.0)
    return {"loss": loss, "similarity": sim, "temperature": temp}
