"""Contrastive (CLIP / SigLIP) training step assembly.

One jitted SPMD program per step over the device mesh: video + text forward,
global-batch contrastive loss (XLA inserts the ICI all_gather), backward,
per-group optimizer update, dynamic freeze-ratio masking — replacing the
reference's DDP step (reference:
runners/video_constrative_learning_runner.py:1212-1537: autocast fwd,
GatherLayer loss, scaler.backward, clip_grad_norm_, log_temp all_reduce).

bf16 compute / fp32 params; no GradScaler (bf16 needs none — the reference's
AMP machinery is obsolete on TPU, SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from deepcoro_clip_tpu.losses import contrastive as closs
from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config
from deepcoro_clip_tpu.models.video_encoder import video_encoder_from_config
from deepcoro_clip_tpu.parallel.batching import make_batch_sharding_fn
from deepcoro_clip_tpu.registry import LossRegistry
from deepcoro_clip_tpu.train import optim as optim_lib
from deepcoro_clip_tpu.train.schedulers import get_scheduler
from deepcoro_clip_tpu.train.state import (
    TrainState,
    replicate_state,
    to_named_shardings,
    unbox_with_spec,
)

PyTree = Any

MULTI_POSITIVE_LOSSES = {
    "siglip_pairwise", "siglip2_bce", "siglip2_bce_ddp",
    "siglip2_multi_positive", "siglip_pairwise_ddp", "weighted_siglip",
    "multi_positive_infonce", "siglip_single_head",
}


class ClipBundle(NamedTuple):
    """Everything static needed to run contrastive training."""

    config: Any
    mesh: Mesh
    video_model: Any
    text_model: Any
    tx: optax.GradientTransformation
    schedule: Callable
    param_spec: PyTree
    video_fracs: PyTree   # freeze-order fractions (static per-leaf scalars)
    text_fracs: PyTree
    state_sharding: Any
    batch_sharding_fn: Callable
    # LocCa report-generation head (reference siglip2_config.yaml:62-66);
    # None unless config.locca_enabled
    locca_decoder: Any = None


def _sample_batch(config, multi_positive: bool) -> Dict[str, np.ndarray]:
    """Tiny host batch with the training shapes (for init/tracing)."""
    B = 2
    N = config.num_videos if config.multi_video else 1
    T, S = config.frames, config.resize
    batch = {
        "videos": np.zeros((B, N, T, S, S, 3), np.float32),
        "video_mask": np.ones((B, N), bool),
        "input_ids": np.zeros((B, config.max_text_length), np.int32),
        "attention_mask": np.ones((B, config.max_text_length), np.int32),
    }
    if multi_positive:
        M = B * config.siglip_max_positive_per_video
        batch["text_valid"] = np.ones((M,), np.float32)
        batch["positive_mask"] = np.zeros((B, M), np.float32)
        batch["positive_weights"] = np.ones((B, M), np.float32)
        batch["input_ids"] = np.zeros((M, config.max_text_length), np.int32)
        batch["attention_mask"] = np.ones((M, config.max_text_length), np.int32)
    if config.locca_enabled:
        L = config.locca_max_seq_len
        batch["caption_ids"] = np.zeros((B, L), np.int32)
        batch["caption_mask"] = np.ones((B, L), np.int32)
        batch["location_mask"] = np.zeros((B, L), np.float32)
    return batch


def build_clip_bundle(
    config, mesh: Mesh, rng: jax.Array, steps_per_epoch: int = 100
) -> tuple[ClipBundle, TrainState]:
    """Build models, params, optimizer, and the initial TrainState."""
    multi_positive = config.loss_name.lower() in MULTI_POSITIVE_LOSSES

    video_model = video_encoder_from_config(
        config, ring_mesh=mesh if config.use_ring_attention else None
    )
    text_model = text_encoder_from_config(config)

    batch = _sample_batch(config, multi_positive)
    rv, rt, rd = jax.random.split(rng, 3)
    vvars = video_model.init(
        {"params": rv, "dropout": rd},
        jnp.asarray(batch["videos"]),
        video_mask=jnp.asarray(batch["video_mask"]),
    )
    tvars = text_model.init(
        {"params": rt, "dropout": rd},
        jnp.asarray(batch["input_ids"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
    )

    vparams, vspec = unbox_with_spec(vvars["params"])
    tparams, tspec = unbox_with_spec(tvars["params"])

    params = {
        "video_encoder": vparams,
        "text_encoder": tparams,
        # learnable temperature (reference log_temperature param,
        # projects/contrastive_pretraining_project.py:117-125)
        "log_temp": jnp.log(jnp.float32(config.temperature)),
        # SigLIP learnable bias, init -10 (reference utils/loss/contrastive.py:225-228)
        "logit_bias": jnp.float32(config.siglip_bias_init),
    }
    param_spec = {
        "video_encoder": vspec,
        "text_encoder": tspec,
        "log_temp": P(),
        "logit_bias": P(),
    }

    locca_decoder = None
    if config.locca_enabled:
        # location-aware decoder over unpooled video tokens: coordinate-
        # conditioned cross-attention, sinusoidal text positions, untied head
        # (reference LocCaDecoder, models/locca_decoder.py:56,135,223-455)
        from deepcoro_clip_tpu.models.locca_decoder import (
            LocCaDecoder,
            locca_token_grid,
        )

        grid, n_special = locca_token_grid(config)
        locca_decoder = LocCaDecoder(
            vocab_size=config.text_vocab_size,
            dim=config.locca_d_model,
            depth=config.locca_num_layers,
            num_heads=config.locca_num_heads,
            max_length=config.locca_max_seq_len,
            memory_dim=config.embedding_dim,
            dropout=config.dropout,
            dtype=jnp.bfloat16 if config.precision == "bf16" else jnp.float32,
            use_flash=config.use_pallas_attention,
            token_grid=grid,
            n_special_tokens=n_special,
        )
        feats = video_model.apply(
            {"params": vparams}, jnp.asarray(batch["videos"]),
            video_mask=jnp.asarray(batch["video_mask"]),
            deterministic=True, method=video_model.features,
        )
        B = batch["videos"].shape[0]
        toks = feats["tokens"].reshape(B, -1, config.embedding_dim)
        rloc = jax.random.fold_in(rv, 7)  # independent of the video tower
        dvars = locca_decoder.init(
            {"params": rloc, "dropout": rd},
            jnp.asarray(batch["caption_ids"]), toks,
        )
        dparams, dspec = unbox_with_spec(dvars["params"])
        params["locca_decoder"] = dparams
        param_spec["locca_decoder"] = dspec

    schedule = get_scheduler(
        config.scheduler_name,
        config.lr,
        steps_per_epoch,
        config.epochs,
        num_warmup_percent=config.num_warmup_percent,
        factor=config.factor,
        lr_step_period=config.lr_step_period,
        num_hard_restarts_cycles=config.num_hard_restarts_cycles,
        warm_restart_tmult=config.warm_restart_tmult,
        gradient_accumulation_steps=config.gradient_accumulation_steps,
    )
    tx = optim_lib.make_clip_optimizer(config, schedule, params)
    if config.gradient_accumulation_steps > 1:
        # micro-batch accumulation (reference grad-accum,
        # runners/video_constrative_learning_runner.py:1223,1387-1424).
        # NOTE: with a contrastive loss the NxN matrix only spans each
        # micro-batch — same semantics as the reference.
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    opt_state = tx.init(params)

    state = TrainState(
        step=jnp.int32(0),
        params=params,
        opt_state=opt_state,
        best_val_loss=jnp.float32(np.inf),
        best_epoch=jnp.int32(-1),
    )

    # Freeze order/extent matches the reference: only the backbone (video) /
    # BERT body (text) is partially freezable, never proj/aggregator/pools.
    video_fracs = optim_lib.freeze_fractions(vparams, include=("backbone",))
    text_fracs = optim_lib.freeze_fractions(tparams, exclude=("proj",))

    state_spec = TrainState(
        step=P(), params=param_spec,
        opt_state=jax.tree_util.tree_map(
            lambda _: P(), opt_state,
            is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
        ),
        best_val_loss=P(), best_epoch=P(),
    )
    state_sharding = to_named_shardings(mesh, state_spec)
    state = jax.device_put(state, state_sharding)

    batch_sharding_fn = make_batch_sharding_fn(
        mesh,
        replicated_keys=(
            ("input_ids", "attention_mask", "text_valid")
            if multi_positive else ("text_valid",)
        ),
    )

    bundle = ClipBundle(
        config=config, mesh=mesh, video_model=video_model, text_model=text_model,
        tx=tx, schedule=schedule, param_spec=param_spec,
        video_fracs=video_fracs, text_fracs=text_fracs,
        state_sharding=state_sharding, batch_sharding_fn=batch_sharding_fn,
        locca_decoder=locca_decoder,
    )
    return bundle, state


def _forward_embeddings(bundle: ClipBundle, params, batch, rngs, deterministic):
    """Returns (v_emb, t_emb, tokens) — tokens is None unless the LocCa head
    needs the unpooled video tokens (one shared backbone pass either way)."""
    # No normalization here on either wire: float batches are normalized by
    # the host collate, and integer (uint8) batches go RAW into the model —
    # the patchify transposes uint8 (1/4 the HBM traffic) and folds the
    # dataset stats into its weights (models/layers.PatchEmbed3D, gated on
    # input dtype; video_encoder_from_config passes cfg stats), saving
    # ~3 ms/step of f32 materialization.
    videos = batch["videos"]
    tokens = None
    want_tokens = (
        bundle.locca_decoder is not None and "caption_ids" in batch
    )
    if want_tokens:
        feats = bundle.video_model.apply(
            {"params": params["video_encoder"]},
            videos,
            video_mask=batch.get("video_mask"),
            deterministic=deterministic,
            rngs=rngs,
            method=bundle.video_model.features,
        )
        v_emb = feats["study"]
        B, N, L, D = feats["tokens"].shape
        tokens = feats["tokens"].reshape(B, N * L, D)
    else:
        v_emb = bundle.video_model.apply(
            {"params": params["video_encoder"]},
            videos,
            video_mask=batch.get("video_mask"),
            deterministic=deterministic,
            rngs=rngs,
        )
    t_emb = bundle.text_model.apply(
        {"params": params["text_encoder"]},
        batch["input_ids"],
        attention_mask=batch["attention_mask"],
        deterministic=deterministic,
        rngs=rngs,
    )
    return v_emb, t_emb, tokens


def compute_loss(bundle: ClipBundle, params, batch, rngs, deterministic=False):
    cfg = bundle.config
    name = cfg.loss_name.lower()
    v_emb, t_emb, tokens = _forward_embeddings(
        bundle, params, batch, rngs, deterministic
    )
    # NaN sanitization (reference scrubs embeddings,
    # runners/video_constrative_learning_runner.py:1236-1245)
    v_emb = jnp.nan_to_num(v_emb)
    t_emb = jnp.nan_to_num(t_emb)

    sample_mask = batch.get("sample_mask")
    if name in MULTI_POSITIVE_LOSSES:
        fn = LossRegistry.get(name)
        out = fn(
            v_emb, t_emb,
            positive_mask=batch["positive_mask"],
            log_temp=params["log_temp"],
            bias=params["logit_bias"],
            positive_weights=batch.get("positive_weights"),
            text_valid=batch.get("text_valid"),
            positive_loss_weight=cfg.siglip_positive_loss_weight,
            negative_loss_weight=cfg.siglip_negative_loss_weight,
            logit_clamp=cfg.siglip_logit_clamp,
            entropy_reg_weight=cfg.siglip_entropy_reg_weight,
            auto_balance=cfg.siglip_auto_balance,
            sample_mask=sample_mask,
        ) if name != "multi_positive_infonce" else fn(
            v_emb, t_emb, batch["positive_mask"], params["log_temp"],
            positive_weights=batch.get("positive_weights"),
            text_valid=batch.get("text_valid"),
            sample_mask=sample_mask,
        )
    elif name in ("siglip", "siglip_ddp"):
        out = closs.siglip_pairwise_loss(
            v_emb, t_emb, params["log_temp"], params["logit_bias"],
            logit_clamp=cfg.siglip_logit_clamp,
            sample_mask=sample_mask,
        )
    else:
        out = closs.clip_loss(
            v_emb, t_emb, params["log_temp"],
            label_smoothing=cfg.label_smoothing,
            sample_mask=sample_mask,
        )
    if tokens is not None:
        # LocCa auxiliary: generate the (reconstructed) report from the
        # unpooled video tokens, with the location-aware loss decomposition
        # (reference locca_weight "relative to SigLIP loss",
        # config/clip/siglip2_config.yaml:63)
        from deepcoro_clip_tpu.losses.locca import locca_combined_loss

        logits = bundle.locca_decoder.apply(
            {"params": params["locca_decoder"]},
            batch["caption_ids"], tokens,
            attention_mask=batch.get("caption_mask"),
            deterministic=deterministic,
            rngs=rngs,
        )
        locca = locca_combined_loss(
            logits, batch["caption_ids"], batch["caption_mask"],
            location_mask=batch.get("location_mask"),
            weights=dict(cfg.locca_task_weights)
            if cfg.locca_task_weights else None,
            label_smoothing=cfg.label_smoothing,
            sample_weights=sample_mask,
        )
        out["locca_loss"] = locca["total"]
        out["loss"] = out["loss"] + cfg.locca_weight * locca["total"]
    out["video_emb"] = v_emb
    out["text_emb"] = t_emb
    return out


def alignment_score(v_emb, t_emb, positive_mask=None, sample_mask=None):
    """Mean matched-pair cosine similarity (reference alignment metrics,
    runners/video_constrative_learning_runner.py:1456-1537).

    Paired mode: mean of the diagonal. Multi-positive mode (``positive_mask``
    [B, M] given): the text bank's row order has no per-video correspondence,
    so the diagonal is noise — average video·text cosine over each video's
    positives instead, excluding device-padding rows via ``sample_mask``."""
    v = closs.l2_normalize(v_emb)
    t = closs.l2_normalize(t_emb)
    if positive_mask is None:
        n = min(v.shape[0], t.shape[0])
        diag = jnp.sum(v[:n] * t[:n], axis=-1)
        if sample_mask is None:
            return jnp.mean(diag)
        m = sample_mask.astype(jnp.float32)[:n]
        return jnp.sum(diag * m) / jnp.maximum(jnp.sum(m), 1.0)
    pos = positive_mask.astype(jnp.float32)
    if sample_mask is not None:
        pos = pos * sample_mask.astype(jnp.float32)[:, None]
    sim = v.astype(jnp.float32) @ t.astype(jnp.float32).T
    return jnp.sum(sim * pos) / jnp.maximum(jnp.sum(pos), 1.0)


def make_train_step(bundle: ClipBundle):
    """The jitted SPMD train step.

    signature: (state, batch, rng, video_freeze_ratio, text_freeze_ratio,
    temp_override) -> (state, metrics). ``temp_override`` < 0 means "use the
    learnable temperature"; otherwise log_temp is pinned to log(override)
    (reference temperature schedules, runner :147-181).
    """
    cfg = bundle.config
    multi_positive = cfg.loss_name.lower() in MULTI_POSITIVE_LOSSES

    def loss_fn(params, batch, rng, temp_override):
        use_sched = temp_override > 0
        lt = jnp.where(use_sched, jnp.log(jnp.maximum(temp_override, 1e-6)),
                       params["log_temp"])
        p = dict(params)
        p["log_temp"] = lt
        out = compute_loss(bundle, p, batch, {"dropout": rng}, deterministic=False)
        return out["loss"], out

    def step(state: TrainState, batch, rng, video_freeze_ratio,
             text_freeze_ratio, temp_override):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, temp_override
        )
        # NaN-guard the gradients (reference NaN sentinels, runner :740-756)
        grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)

        # dynamic partial freeze: mask grads BEFORE the optimizer update so
        # Adam moments don't accumulate for frozen leaves (the reference's
        # requires_grad=False accumulates nothing), then mask the updates
        # too so weight decay can't move frozen params.
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
        # pinned temperature: no log_temp learning
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
            "temperature": out["temperature"],
            "alignment": alignment_score(
                out["video_emb"], out["text_emb"],
                positive_mask=(batch.get("positive_mask")
                               if multi_positive else None),
                sample_mask=batch.get("sample_mask"),
            ),
            "grad_norm": optim_lib.global_norm(grads),
            # per-layer gradient norms (reference log_gradient_norms,
            # utils/wandb_logger.py:491-510): per tower always, per backbone
            # block when cfg.log_layer_grad_norms (they cost ~5% step time)
            **{f"grad_norm_{k}": optim_lib.global_norm(v)
               for k, v in grads.items()
               if k in ("video_encoder", "text_encoder", "locca_decoder")},
            **({f"grad_norm_video_{k}": optim_lib.global_norm(v)
                for k, v in grads["video_encoder"].get("backbone", {}).items()}
               if getattr(cfg, "log_layer_grad_norms", False) else {}),
            "video_emb_norm": jnp.mean(
                jnp.linalg.norm(out["video_emb"].astype(jnp.float32), axis=-1)
            ),
            "text_emb_norm": jnp.mean(
                jnp.linalg.norm(out["text_emb"].astype(jnp.float32), axis=-1)
            ),
            "lr": bundle.schedule(
                optim_lib.optimizer_step_count(opt_state, state.step)
            ),
        }
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(bundle.state_sharding, None, None, None, None, None),
        out_shardings=(bundle.state_sharding, None),
        donate_argnums=(0,),
    )


def make_eval_step(bundle: ClipBundle):
    """Jitted embedding forward for validation/inference (deterministic)."""
    multi_positive = (
        bundle.config.loss_name.lower() in MULTI_POSITIVE_LOSSES
    )

    def step(params, batch):
        out = compute_loss(
            bundle, params, batch, rngs=None, deterministic=True
        )
        return {
            "loss": out["loss"],
            "video_emb": out["video_emb"],
            "text_emb": out["text_emb"],
            "alignment": alignment_score(
                out["video_emb"], out["text_emb"],
                positive_mask=(batch.get("positive_mask")
                               if multi_positive else None),
                sample_mask=batch.get("sample_mask"),
            ),
        }

    return jax.jit(step)


def make_scan_train_steps(bundle: ClipBundle, n_steps: int = 4):
    """K train steps fused into one jitted program via lax.scan (single
    dispatch). Used by bench.py to measure pure device step time; training
    loops use make_train_step (per-step host control for schedules/logging).
    """
    def loss_fn(params, batch, rng):
        out = compute_loss(bundle, params, batch, {"dropout": rng},
                           deterministic=False)
        return out["loss"], out

    def one_step(state, batch, rng):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = bundle.tx.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    def run(state, batch, rng):
        def body(carry, i):
            st, r = carry
            r, sub = jax.random.split(r)
            st, loss = one_step(st, batch, sub)
            return (st, r), loss

        (state, _), losses = jax.lax.scan(
            body, (state, rng), jnp.arange(n_steps)
        )
        return state, {"loss": losses[-1]}

    return jax.jit(
        run,
        in_shardings=(bundle.state_sharding, None, None),
        out_shardings=(bundle.state_sharding, None),
        donate_argnums=(0,),
    )
