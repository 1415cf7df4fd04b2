"""Multitask (contrastive + captioning + MVM) training step assembly.

Reference counterpart: projects/multitask_pretraining_project.py:31-442 +
runners/multitask_runner.py:56-1775 — shared VideoEncoder, TextEncoder,
CaptioningDecoder and MaskedVideoModeling trained jointly with per-task LRs
and scheduled loss weights. One backbone token pass feeds all three tasks
(reference :764-793).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from deepcoro_clip_tpu.losses.contrastive import clip_loss
from deepcoro_clip_tpu.losses.locca import locca_combined_loss
from deepcoro_clip_tpu.losses.multitask import captioning_loss
from deepcoro_clip_tpu.models.captioning_decoder import CaptioningDecoder
from deepcoro_clip_tpu.models.masked_video_modeling import (
    MaskedVideoModeling,
    random_token_mask,
)
from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config
from deepcoro_clip_tpu.models.video_encoder import video_encoder_from_config
from deepcoro_clip_tpu.parallel.batching import make_batch_sharding_fn
from deepcoro_clip_tpu.train import optim as optim_lib
from deepcoro_clip_tpu.train.schedulers import get_scheduler
from deepcoro_clip_tpu.train.state import TrainState, to_named_shardings, unbox_with_spec

PyTree = Any


class MultitaskBundle(NamedTuple):
    config: Any
    mesh: Mesh
    video_model: Any
    text_model: Any
    decoder: Any
    mvm: Any
    tx: optax.GradientTransformation
    schedule: Callable
    state_sharding: Any
    batch_sharding_fn: Callable
    # freeze-order fractions for dynamic partial freezing (reference
    # multitask freeze schedules, runners/multitask_runner.py)
    video_fracs: PyTree = None
    text_fracs: PyTree = None


def build_multitask_bundle(cfg, mesh: Mesh, rng: jax.Array,
                           steps_per_epoch: int = 100):
    video_model = video_encoder_from_config(cfg)
    text_model = text_encoder_from_config(cfg)
    decoder = CaptioningDecoder(
        vocab_size=cfg.text_vocab_size,
        dim=cfg.decoder_dim,
        depth=cfg.decoder_depth,
        num_heads=cfg.decoder_heads,
        max_length=cfg.decoder_max_length,
        memory_dim=cfg.embedding_dim,
        dropout=cfg.dropout,
        dtype=jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32,
        use_flash=cfg.use_pallas_attention,
    )
    mvm = MaskedVideoModeling(
        dim=cfg.embedding_dim,
        decoder_dim=cfg.mvm_decoder_dim,
        decoder_depth=cfg.mvm_decoder_depth,
        num_heads=cfg.num_heads,
        mask_ratio=cfg.mask_ratio,
        norm_targets=cfg.mvm_norm_targets,
        dtype=jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32,
        use_flash=False,
    )

    B, N = 2, cfg.num_videos if cfg.multi_video else 1
    videos = jnp.zeros((B, N, cfg.frames, cfg.resize, cfg.resize, 3), jnp.float32)
    vmask = jnp.ones((B, N), bool)
    ids = jnp.zeros((B, cfg.max_text_length), jnp.int32)
    amask = jnp.ones_like(ids)
    cap_ids = jnp.zeros((B, cfg.decoder_max_length), jnp.int32)

    r = jax.random.split(rng, 5)
    vvars = video_model.init({"params": r[0], "dropout": r[4]}, videos,
                             video_mask=vmask)
    vparams, vspec = unbox_with_spec(vvars["params"])
    tvars = text_model.init({"params": r[1], "dropout": r[4]}, ids,
                            attention_mask=amask)
    tparams, tspec = unbox_with_spec(tvars["params"])

    feats = video_model.apply(
        {"params": vparams}, videos, video_mask=vmask,
        deterministic=True, method=video_model.features,
    )
    toks_flat = feats["tokens"].reshape(B, -1, cfg.embedding_dim)
    dvars = decoder.init({"params": r[2], "dropout": r[4]}, cap_ids, toks_flat)
    dparams, dspec = unbox_with_spec(dvars["params"])

    clip_toks = feats["tokens"].reshape(B * N, -1, cfg.embedding_dim)
    mmask = random_token_mask(r[3], B * N, clip_toks.shape[1], cfg.mask_ratio)
    mvars = mvm.init({"params": r[3], "dropout": r[4]}, clip_toks, mmask)
    mparams, mspec = unbox_with_spec(mvars["params"])

    params = {
        "video_encoder": vparams, "text_encoder": tparams,
        "decoder": dparams, "mvm": mparams,
        "log_temp": jnp.log(jnp.float32(cfg.temperature)),
    }
    spec = {
        "video_encoder": vspec, "text_encoder": tspec,
        "decoder": dspec, "mvm": mspec, "log_temp": P(),
    }

    schedule = get_scheduler(
        cfg.scheduler_name, cfg.lr, steps_per_epoch, cfg.epochs,
        num_warmup_percent=cfg.num_warmup_percent, factor=cfg.factor,
        lr_step_period=cfg.lr_step_period,
        gradient_accumulation_steps=cfg.gradient_accumulation_steps,
    )

    # per-task LR groups (reference: projects/multitask_pretraining_project.py)
    def label(path, _):
        top = str(getattr(path[0], "key", path[0]))
        return {
            "video_encoder": "video", "text_encoder": "text",
            "decoder": "captioning", "mvm": "mvm",
        }.get(top, "scalar")

    labels = jax.tree_util.tree_map_with_path(label, params)

    def scaled(lr_value):
        s = lr_value / max(cfg.lr, 1e-12)
        return lambda step: schedule(step) * s

    def opt(lr_value, wd):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm or 1.0),
            optax.adamw(scaled(lr_value), weight_decay=wd),
        )

    tx = optax.multi_transform(
        {
            "video": opt(cfg.lr, cfg.video_weight_decay),
            "text": opt(cfg.text_lr, cfg.text_weight_decay),
            "captioning": opt(cfg.captioning_lr, cfg.video_weight_decay),
            "mvm": opt(cfg.mvm_lr, cfg.video_weight_decay),
            "scalar": opt(cfg.lr, 0.0),
        },
        labels,
    )
    # the schedule horizon above is expressed in UPDATES (steps/accum), so
    # micro-steps must actually accumulate (as train/clip.py does)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    opt_state = tx.init(params)

    state = TrainState(
        step=jnp.int32(0), params=params, opt_state=opt_state,
        best_val_loss=jnp.float32(np.inf), best_epoch=jnp.int32(-1),
    )
    state_spec = TrainState(
        step=P(), params=spec,
        opt_state=jax.tree_util.tree_map(lambda _: P(), opt_state),
        best_val_loss=P(), best_epoch=P(),
    )
    state_sharding = to_named_shardings(mesh, state_spec)
    state = jax.device_put(state, state_sharding)

    batch_sharding_fn = make_batch_sharding_fn(mesh)

    bundle = MultitaskBundle(
        config=cfg, mesh=mesh, video_model=video_model, text_model=text_model,
        decoder=decoder, mvm=mvm, tx=tx, schedule=schedule,
        state_sharding=state_sharding, batch_sharding_fn=batch_sharding_fn,
        video_fracs=optim_lib.freeze_fractions(vparams, include=("backbone",)),
        text_fracs=optim_lib.freeze_fractions(tparams, exclude=("proj",)),
    )
    return bundle, state


def multitask_forward(bundle: MultitaskBundle, params, batch, rng,
                      deterministic=False, ss_prob=None):
    """All three task losses from one backbone pass.

    ``ss_prob`` (traced scalar, training only): scheduled-sampling mix
    probability — when the config enables it, the decoder runs a second
    pass whose inputs at t>0 are its own pass-1 predictions with
    probability ``ss_prob`` (targets stay gold)."""
    cfg = bundle.config
    rngs = {"dropout": rng} if rng is not None else None
    # no normalization on either wire: floats are host-normalized, uint8
    # goes RAW — the patchify folds the dataset stats into its weights,
    # gated on input dtype (models/layers.PatchEmbed3D; see train/clip.py)
    videos = batch["videos"]
    feats = bundle.video_model.apply(
        {"params": params["video_encoder"]}, videos,
        video_mask=batch.get("video_mask"), deterministic=deterministic,
        rngs=rngs, method=bundle.video_model.features,
    )
    B, N, L, D = feats["tokens"].shape

    t_emb = bundle.text_model.apply(
        {"params": params["text_encoder"]}, batch["input_ids"],
        attention_mask=batch["attention_mask"], deterministic=deterministic,
        rngs=rngs,
    )
    sample_mask = batch.get("sample_mask")
    contrastive = clip_loss(
        jnp.nan_to_num(feats["study"]), jnp.nan_to_num(t_emb),
        params["log_temp"], label_smoothing=cfg.label_smoothing,
        sample_mask=sample_mask,
    )

    toks_flat = feats["tokens"].reshape(B, N * L, D)
    cap_ids = batch["caption_ids"]
    logits = bundle.decoder.apply(
        {"params": params["decoder"]}, cap_ids, toks_flat,
        attention_mask=batch.get("caption_mask"),
        deterministic=deterministic, rngs=rngs,
    )
    if (ss_prob is not None and not deterministic
            and cfg.scheduled_sampling_prob > 0):
        # two-pass parallel scheduled sampling: pass-1 logits (teacher
        # forced, above) provide the model's next-token predictions; the
        # second pass feeds them back as inputs with probability ss_prob.
        # BOS stays gold; loss targets stay gold (cap_ids) either way.
        preds = jnp.argmax(logits, axis=-1)  # [B, L]: pred for token t+1
        prev_pred = jnp.concatenate([cap_ids[:, :1], preds[:, :-1]], axis=1)
        mix_rng = (jax.random.fold_in(rng, 2) if rng is not None
                   else jax.random.PRNGKey(0))
        mix = jax.random.bernoulli(mix_rng, ss_prob, cap_ids.shape)
        not_bos = jnp.arange(cap_ids.shape[1])[None, :] > 0
        mixed_ids = jax.lax.stop_gradient(
            jnp.where(mix & not_bos, prev_pred, cap_ids)
        )
        logits = bundle.decoder.apply(
            {"params": params["decoder"]}, mixed_ids, toks_flat,
            attention_mask=batch.get("caption_mask"),
            deterministic=deterministic, rngs=rngs,
        )
    cap_weights = batch.get("caption_weights")
    if sample_mask is not None:
        cap_weights = (cap_weights if cap_weights is not None else 1.0) * sample_mask
    locca_parts = {}
    if cfg.locca_enabled and "location_mask" in batch:
        # location-aware decomposition (reference utils/loss/locca_loss.py):
        # captioning + referring-expression + grounded-captioning
        locca_parts = locca_combined_loss(
            logits, cap_ids, batch["caption_mask"],
            location_mask=batch["location_mask"],
            weights=dict(cfg.locca_task_weights) if cfg.locca_task_weights
            else {"captioning": 1.0, "referring": cfg.locca_weight,
                  "grounded": cfg.locca_weight},
            label_smoothing=cfg.caption_label_smoothing,
            sample_weights=cap_weights,
        )
        cap_loss = locca_parts.pop("total")
    else:
        cap_loss = captioning_loss(
            logits, cap_ids, batch["caption_mask"],
            label_smoothing=cfg.caption_label_smoothing,
            sample_weights=cap_weights,
        )

    clip_toks = feats["tokens"].reshape(B * N, L, D)
    mask_rng = (jax.random.fold_in(rng, 1) if rng is not None
                else jax.random.PRNGKey(0))
    tok_mask = random_token_mask(mask_rng, B * N, L, cfg.mask_ratio)
    if sample_mask is not None:
        # padded (duplicate) rows must not enter the masked-MSE average —
        # the contrastive/captioning losses already honor sample_mask
        tok_mask = tok_mask & jnp.repeat(
            sample_mask.astype(bool), N)[:, None]
    mvm_out = bundle.mvm.apply(
        {"params": params["mvm"]}, clip_toks, tok_mask,
        deterministic=deterministic, rngs=rngs,
    )

    # multi<->single-view consistency (reference:
    # runners/multitask_runner.py:788-791, 897-913): the multi-view study
    # embedding should stay close to the AGGREGATOR output of a single view
    # (both vectors live in aggregator space; only meaningful for
    # multi_video — the reference gates on it and the term is 0 otherwise)
    if cfg.multi_video and cfg.consistency_weight > 0 and N > 1:
        single_study = bundle.video_model.apply(
            {"params": params["video_encoder"]},
            feats["video"][:, :1],  # first view (always a real clip)
            deterministic=deterministic,
            rngs=rngs,
            method=bundle.video_model.aggregate,
        ).astype(jnp.float32)

        def _norm(x):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
            )

        cos = jnp.sum(_norm(feats["study"].astype(jnp.float32))
                      * _norm(single_study), axis=-1)
        if sample_mask is not None:
            sm = sample_mask.astype(jnp.float32)
            consistency = (jnp.sum((1.0 - cos) * sm)
                           / jnp.maximum(jnp.sum(sm), 1.0))
        else:
            consistency = jnp.mean(1.0 - cos)
    else:
        consistency = jnp.float32(0.0)

    return {
        "contrastive": contrastive["loss"],
        "captioning": cap_loss,
        "mvm": mvm_out["loss"],
        "consistency": consistency,
        "temperature": contrastive["temperature"],
        "video_emb": feats["study"],
        "text_emb": t_emb,
        "caption_logits": logits,
        # reused by validation for caption generation — one backbone pass
        # per val batch (features() exists precisely for this)
        "video_tokens": toks_flat,
        **{f"locca_{k}": v for k, v in locca_parts.items()},
    }


def make_multitask_train_step(bundle: MultitaskBundle):
    cfg = bundle.config

    def loss_fn(params, batch, rng, w_con, w_cap, w_mvm, temp_override,
                ss_prob=None):
        use_sched = temp_override > 0
        p = dict(params)
        p["log_temp"] = jnp.where(
            use_sched, jnp.log(jnp.maximum(temp_override, 1e-6)),
            params["log_temp"],
        )
        out = multitask_forward(bundle, p, batch, rng, deterministic=False,
                                ss_prob=ss_prob)
        total = (w_con * out["contrastive"] + w_cap * out["captioning"]
                 + w_mvm * out["mvm"]
                 + cfg.consistency_weight * out["consistency"])
        return total, out

    def step(state: TrainState, batch, rng, w_con, w_cap, w_mvm,
             video_freeze_ratio, text_freeze_ratio, temp_override):
        ss_prob = None
        if cfg.scheduled_sampling_prob > 0:  # static gate: program unchanged when off
            warm = max(1, int(cfg.scheduled_sampling_warmup_steps))
            ramp = jnp.minimum(state.step.astype(jnp.float32) / warm, 1.0)
            ss_prob = jnp.float32(cfg.scheduled_sampling_prob) * (
                ramp if cfg.scheduled_sampling_warmup_steps > 0 else 1.0
            )
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, w_con, w_cap, w_mvm, temp_override,
            ss_prob
        )
        grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
        # dynamic partial freeze: grads masked pre-update (no moment buildup),
        # updates masked post-update (no weight decay on frozen leaves)
        grads["video_encoder"] = optim_lib.apply_freeze_mask(
            grads["video_encoder"], bundle.video_fracs, video_freeze_ratio
        )
        grads["text_encoder"] = optim_lib.apply_freeze_mask(
            grads["text_encoder"], bundle.text_fracs, text_freeze_ratio
        )
        updates, opt_state = bundle.tx.update(grads, state.opt_state, state.params)
        updates["video_encoder"] = optim_lib.apply_freeze_mask(
            updates["video_encoder"], bundle.video_fracs, video_freeze_ratio
        )
        updates["text_encoder"] = optim_lib.apply_freeze_mask(
            updates["text_encoder"], bundle.text_fracs, text_freeze_ratio
        )
        updates["log_temp"] = jnp.where(
            temp_override > 0, 0.0, updates["log_temp"]
        )
        params = optax.apply_updates(state.params, updates)
        # non-finite loss: no update at all (params, moments, opt counter)
        params, opt_state = optim_lib.keep_old_if_nonfinite(
            loss, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = {
            "loss": loss,
            "loss_contrastive": out["contrastive"],
            "loss_captioning": out["captioning"],
            "loss_mvm": out["mvm"],
            "loss_consistency": out["consistency"],
            "temperature": out["temperature"],
            "lr": bundle.schedule(
                optim_lib.optimizer_step_count(opt_state, state.step)
            ),
        }
        if ss_prob is not None:
            metrics["ss_prob"] = ss_prob
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return jax.jit(
        step,
        in_shardings=(bundle.state_sharding,) + (None,) * 8,
        out_shardings=(bundle.state_sharding, None),
        donate_argnums=(0,),
    )
