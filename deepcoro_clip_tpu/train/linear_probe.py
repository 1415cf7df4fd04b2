"""Linear-probing / MIL training step assembly.

Reference counterpart: projects/linear_probing_project.py:29-347 +
VideoMILWrapper (:49-114) — frozen CLIP video encoder producing [B, N, D]
(or hierarchical [B, N, L, D]) embeddings, a MultiInstanceLinearProbing head,
per-head/attention/view-embedding param groups, MultiHeadLoss.

TPU design: one jitted step over the mesh; encoder freezing is an update
mask (ratio 1.0 = fully frozen, the reference's full-freeze->eval mode,
:203-206).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from deepcoro_clip_tpu.losses.heads import multi_head_loss
from deepcoro_clip_tpu.models.mil import MultiInstanceLinearProbing
from deepcoro_clip_tpu.models.video_encoder import video_encoder_from_config
from deepcoro_clip_tpu.parallel.batching import make_batch_sharding_fn
from deepcoro_clip_tpu.train import optim as optim_lib
from deepcoro_clip_tpu.train.schedulers import get_scheduler
from deepcoro_clip_tpu.train.state import TrainState, to_named_shardings, unbox_with_spec

PyTree = Any


class ProbeBundle(NamedTuple):
    config: Any
    mesh: Mesh
    video_model: Any
    mil_model: Any
    tx: optax.GradientTransformation
    schedule: Callable
    video_fracs: PyTree
    state_sharding: Any
    batch_sharding_fn: Callable
    head_names: tuple


def _mil_from_config(cfg) -> MultiInstanceLinearProbing:
    return MultiInstanceLinearProbing(
        embedding_dim=cfg.embedding_dim,
        head_structure=dict(cfg.head_structure),
        pooling_mode=cfg.pooling_mode,
        attention_hidden=cfg.attention_hidden,
        dropout=cfg.dropout,
        dropout_attention=cfg.dropout_attention,
        num_heads=cfg.num_heads,
        separate_video_attention=cfg.separate_video_attention,
        normalization_strategy=cfg.normalization_strategy,
        use_view_embeddings=cfg.use_view_embeddings,
        num_view_classes=cfg.num_view_classes,
        hierarchical=cfg.hierarchical_tokens,
        dtype=jnp.float32,
        use_flash=cfg.use_pallas_attention,
    )


def make_probe_optimizer(cfg, schedule, params):
    """Param groups (reference: projects/linear_probing_project.py:231-303):
    per-head lr/wd, attention lrs (within/across), view-embedding lr,
    encoder base lr."""

    def label(path, _):
        parts = [str(getattr(k, "key", k)) for k in path]
        top = parts[0]
        if top == "video_encoder":
            return "encoder"
        joined = "/".join(parts)
        for head in cfg.head_structure:
            if f"head_{head}" in joined:
                return f"head_{head}"
        if "view_embeddings" in joined:
            return "view_embedding"
        if "within" in joined:
            return "attention_within"
        if "across" in joined or "shared" in joined:
            return "attention_across"
        return "mil_other"

    labels = jax.tree_util.tree_map_with_path(label, params)

    def scaled(lr_value, base=cfg.lr):
        s = (lr_value if lr_value is not None else base) / max(base, 1e-12)
        return lambda step: schedule(step) * s

    def opt(lr_value, wd):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm or 1.0),
            optax.adamw(scaled(lr_value), weight_decay=wd),
        )

    transforms = {
        "encoder": opt(cfg.lr, cfg.weight_decay),
        "view_embedding": opt(cfg.view_embedding_lr, cfg.weight_decay),
        "attention_within": opt(
            cfg.attention_within_lr or cfg.attention_lr,
            cfg.attention_within_weight_decay or cfg.attention_weight_decay
            or cfg.weight_decay,
        ),
        "attention_across": opt(
            cfg.attention_across_lr or cfg.attention_lr,
            cfg.attention_across_weight_decay or cfg.attention_weight_decay
            or cfg.weight_decay,
        ),
        "mil_other": opt(cfg.lr, cfg.weight_decay),
    }
    for head in cfg.head_structure:
        transforms[f"head_{head}"] = opt(
            cfg.head_lr.get(head, cfg.lr),
            cfg.head_weight_decay.get(head, cfg.weight_decay),
        )
    return optax.multi_transform(transforms, labels)


def _merge_encoder_params(new: PyTree, old: PyTree) -> PyTree:
    """Partial weight transfer by matching key paths: subtrees present in
    BOTH the probing encoder and the checkpoint transfer; probing-only
    subtrees keep their fresh init. The CLIP encoder carries an
    ``aggregator`` the probing encoder lacks, and the probing per-video
    pooling head (``pool``) does not exist in the CLIP tree — a strict
    tree_map would reject the transplant outright (the reference's loader
    is similarly non-strict: projects/linear_probing_project.py:516-544
    repairs prefixes and loads what matches)."""
    if isinstance(new, dict) and isinstance(old, dict):
        return {
            k: (_merge_encoder_params(v, old[k]) if k in old else v)
            for k, v in new.items()
        }
    if isinstance(new, dict) or isinstance(old, dict):
        return new  # structural mismatch below a shared key: keep fresh init
    arr = np.asarray(old, np.asarray(new).dtype)
    if arr.shape != np.asarray(new).shape:
        return new  # shape mismatch (different geometry): keep fresh init
    return arr


def build_probe_bundle(
    cfg, mesh: Mesh, rng: jax.Array, steps_per_epoch: int = 100,
    encoder_params: Optional[PyTree] = None,
):
    """encoder_params: pretrained video-encoder params (from a CLIP
    checkpoint); fresh init when None."""
    # encoder emits per-video embeddings [B, N, D] (aggregate forced off,
    # reference :342-354) or patch tokens for hierarchical MIL
    video_model = video_encoder_from_config(
        cfg, aggregate=False, per_video=not cfg.hierarchical_tokens
    )
    mil_model = _mil_from_config(cfg)

    B, N = 2, cfg.num_videos
    videos = jnp.zeros((B, N, cfg.frames, cfg.resize, cfg.resize, 3), jnp.float32)
    mask = jnp.ones((B, N), bool)
    view_ids = jnp.zeros((B, N), jnp.int32) if cfg.use_view_embeddings else None

    rv, rm, rd = jax.random.split(rng, 3)
    vvars = video_model.init({"params": rv, "dropout": rd}, videos)
    vparams, vspec = unbox_with_spec(vvars["params"])
    if encoder_params is not None:
        vparams = _merge_encoder_params(vparams, encoder_params)

    emb = video_model.apply({"params": vparams}, videos, deterministic=True)
    if cfg.hierarchical_tokens:
        Bn, NL, D = emb.shape
        emb = emb.reshape(B, N, NL // N, D)
    mvars = mil_model.init(
        {"params": rm, "dropout": rd}, emb, mask=mask, view_ids=view_ids
    )
    mparams, mspec = unbox_with_spec(mvars["params"])

    params = {"video_encoder": vparams, "mil": mparams}
    param_spec = {"video_encoder": vspec, "mil": mspec}

    schedule = get_scheduler(
        cfg.scheduler_name, cfg.lr, steps_per_epoch, cfg.epochs,
        num_warmup_percent=cfg.num_warmup_percent, factor=cfg.factor,
        lr_step_period=cfg.lr_step_period,
        num_hard_restarts_cycles=cfg.num_hard_restarts_cycles,
        warm_restart_tmult=cfg.warm_restart_tmult,
        gradient_accumulation_steps=cfg.gradient_accumulation_steps,
    )
    tx = make_probe_optimizer(cfg, schedule, params)
    # the schedule horizon is in UPDATES (steps/accum) — accumulate for real
    # (as train/clip.py does)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    opt_state = tx.init(params)

    state = TrainState(
        step=jnp.int32(0), params=params, opt_state=opt_state,
        best_val_loss=jnp.float32(np.inf), best_epoch=jnp.int32(-1),
    )
    state_spec = TrainState(
        step=P(), params=param_spec,
        opt_state=jax.tree_util.tree_map(lambda _: P(), opt_state),
        best_val_loss=P(), best_epoch=P(),
    )
    state_sharding = to_named_shardings(mesh, state_spec)
    state = jax.device_put(state, state_sharding)

    batch_sharding_fn = make_batch_sharding_fn(mesh)

    bundle = ProbeBundle(
        config=cfg, mesh=mesh, video_model=video_model, mil_model=mil_model,
        tx=tx, schedule=schedule,
        video_fracs=optim_lib.freeze_fractions(vparams, include=("backbone",)),
        state_sharding=state_sharding, batch_sharding_fn=batch_sharding_fn,
        head_names=tuple(cfg.head_structure),
    )
    return bundle, state


def forward_heads(bundle: ProbeBundle, params, batch, rngs, deterministic=True):
    cfg = bundle.config
    # no normalization on either wire: floats are host-normalized, uint8
    # goes RAW — the patchify folds the dataset stats into its weights,
    # gated on input dtype (models/layers.PatchEmbed3D; see train/clip.py)
    videos = batch["videos"]
    emb = bundle.video_model.apply(
        {"params": params["video_encoder"]}, videos,
        deterministic=deterministic or cfg.video_freeze_ratio >= 1.0,
        rngs=rngs,
    )
    if cfg.hierarchical_tokens:
        B, N = batch["videos"].shape[:2]
        emb = emb.reshape(B, N, emb.shape[1] // N, emb.shape[-1])
    outputs = bundle.mil_model.apply(
        {"params": params["mil"]}, emb,
        mask=batch.get("video_mask"),
        view_ids=batch.get("view_ids"),
        deterministic=deterministic,
        rngs=rngs,
    )
    return outputs, emb


def make_probe_train_step(bundle: ProbeBundle):
    cfg = bundle.config

    def loss_fn(params, batch, rng):
        outputs, _ = forward_heads(
            bundle, params, batch, {"dropout": rng}, deterministic=False
        )
        losses = multi_head_loss(
            outputs, batch["targets"], dict(cfg.loss_structure),
            head_weights=dict(cfg.head_weights),
            sample_mask=batch.get("sample_mask"),
        )
        return losses["main"], (losses, outputs)

    def step(state: TrainState, batch, rng, encoder_freeze_ratio):
        (loss, (losses, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
        # mask grads pre-update (no moment buildup on frozen leaves) and the
        # updates post-update (no weight decay on frozen leaves)
        grads["video_encoder"] = optim_lib.apply_freeze_mask(
            grads["video_encoder"], bundle.video_fracs, encoder_freeze_ratio
        )
        updates, opt_state = bundle.tx.update(grads, state.opt_state, state.params)
        updates["video_encoder"] = optim_lib.apply_freeze_mask(
            updates["video_encoder"], bundle.video_fracs, encoder_freeze_ratio
        )
        params = optax.apply_updates(state.params, updates)
        # non-finite loss: no update at all (params, moments, opt counter)
        params, opt_state = optim_lib.keep_old_if_nonfinite(
            loss, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = {"loss": loss, "lr": bundle.schedule(state.step),
                   "grad_norm": optim_lib.global_norm(grads)}
        metrics.update({f"loss_{h}": losses[h] for h in bundle.head_names})
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return jax.jit(
        step,
        in_shardings=(bundle.state_sharding, None, None, None),
        out_shardings=(bundle.state_sharding, None),
        donate_argnums=(0,),
    )


def make_probe_eval_step(bundle: ProbeBundle):
    def step(params, batch):
        outputs, emb = forward_heads(bundle, params, batch, None, True)
        losses = multi_head_loss(
            outputs, batch["targets"], dict(bundle.config.loss_structure),
            head_weights=dict(bundle.config.head_weights),
            sample_mask=batch.get("sample_mask"),
        )
        return {"outputs": outputs, "loss": losses["main"], "embeddings": emb}

    return jax.jit(step)
