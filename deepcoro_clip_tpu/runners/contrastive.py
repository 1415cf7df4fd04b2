"""Contrastive (CLIP / SigLIP) runner: epoch driver, validation retrieval,
checkpointing, inference.

TPU-native rebuild of the reference's ``VideoContrastiveLearningRunner``
(reference: runners/video_constrative_learning_runner.py:47-1826):
- train(): temperature + freeze schedules per epoch (:147-255), epoch-seeded
  sampling (:342-345), train epoch -> val epoch -> best/latest/alignment
  checkpoints (:385-430), early stopping (:450-459), NaN-loss save-and-raise
  (:478-492);
- validation: embedding accumulation, text dedup, unique-text re-encode in
  fixed-size batches (:904-941), NxM similarity + Recall@k/MRR/MAP/NDCG/
  MedianRank (:982-999), CSV/npz artifacts (:1001-1017);
- inference(): precomputed text-embedding bank + metadata -> top-k averaged
  metadata CSV (:1731-1826).

Differences by design: one SPMD process (no rank gathers — the device mesh
sees the global batch); fixed-shape batches with sample masks instead of
variable-size gathers; orbax checkpoints.
"""

from __future__ import annotations

import math
import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from deepcoro_clip_tpu.data.collate import collate_clip, collate_multi_positive
from deepcoro_clip_tpu.data.datasets import VideoClipDataset
from deepcoro_clip_tpu.data.loader import PrefetchLoader
from deepcoro_clip_tpu.data.sampler import ShardedBatchSampler
from deepcoro_clip_tpu.data.tokenizer import get_tokenizer
from deepcoro_clip_tpu.runners.common import make_runner_mesh, resolve_dataset_stats
from deepcoro_clip_tpu.registry import RunnerRegistry
from deepcoro_clip_tpu.train import clip as clip_train
from deepcoro_clip_tpu.train.checkpoint import CheckpointManager
from deepcoro_clip_tpu.train.run_schedules import freeze_ratio_at, temperature_at
from deepcoro_clip_tpu.utils.logging_utils import MetricsLogger
from deepcoro_clip_tpu.utils.retrieval_metrics import (
    compute_alignment_score,
    compute_retrieval_metrics,
)


def _load_checkpoint_params(path: str):
    """Raw params tree out of a saved run checkpoint (layout written by
    train/checkpoint.CheckpointManager)."""
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(Path(path).resolve())
    return restored.get("params", restored)


def _merge_params_by_path(new, old):
    """Leaf-for-leaf transplant where key paths AND shapes match; fresh init
    elsewhere (same non-strict semantics as the probing encoder loader,
    train/linear_probe._merge_encoder_params)."""
    if isinstance(new, dict) and isinstance(old, dict):
        return {k: (_merge_params_by_path(v, old[k]) if k in old else v)
                for k, v in new.items()}
    if isinstance(new, dict) or isinstance(old, dict):
        return new
    new_arr = np.asarray(new)
    # cast to the target dtype so a warm start across precision settings
    # can't silently swap the compiled train step's param dtype
    arr = np.asarray(old)
    return arr.astype(new_arr.dtype) if arr.shape == new_arr.shape else new


class NonFiniteLossError(RuntimeError):
    """Reference: runners/video_constrative_learning_runner_simple.py:44-51."""


@RunnerRegistry.register("DeepCORO_clip", "DeepCORO_clip_simple")
class VideoContrastiveLearningRunner:
    def __init__(
        self,
        config,
        output_dir: Optional[str] = None,
        mesh=None,
        datasets: Optional[Dict[str, Any]] = None,
    ):
        self.config = config
        self.output_dir = Path(output_dir or config.output_dir)
        self.mesh = mesh if mesh is not None else make_runner_mesh(config)
        self.tokenizer = get_tokenizer(
            vocab_size=config.text_vocab_size, max_length=config.max_text_length
        )
        self.multi_positive = (
            config.loss_name.lower() in clip_train.MULTI_POSITIVE_LOSSES
        )

        self.siglip_resources = None  # set when siglip manifests are wired
        self.datasets = datasets if datasets is not None else self._build_datasets()
        self._resolve_stats()
        self.loaders = {
            split: self._make_loader(ds, split == "train")
            for split, ds in self.datasets.items()
            if ds is not None
        }

        steps_per_epoch = max(1, len(self.loaders.get("train", [])) or 1)
        self.bundle, self.state = clip_train.build_clip_bundle(
            config, self.mesh, jax.random.PRNGKey(config.seed),
            steps_per_epoch=steps_per_epoch,
        )
        if getattr(config, "init_from_checkpoint", None):
            # params-only warm start (fresh optimizer/schedule): partial
            # by-path merge so a checkpoint from a sibling pipeline (e.g.
            # single-video -> study mode) transplants every matching leaf,
            # re-placed under this run's shardings
            merged = _merge_params_by_path(
                jax.device_get(self.state.params),
                _load_checkpoint_params(config.init_from_checkpoint))
            params = jax.tree_util.tree_map(
                lambda old, new: jax.device_put(np.asarray(new), old.sharding),
                self.state.params, merged)
            self.state = self.state.replace(params=params)
        self.train_step = clip_train.make_train_step(self.bundle)
        self.eval_step = clip_train.make_eval_step(self.bundle)
        self._text_encode = jax.jit(
            lambda params, ids, mask: self.bundle.text_model.apply(
                {"params": params["text_encoder"]}, ids, attention_mask=mask,
                deterministic=True,
            )
        )
        self.ckpt = CheckpointManager(self.output_dir / "checkpoints")
        self.logger = MetricsLogger(
            self.output_dir, use_wandb=config.use_wandb, config=config,
            is_ref_device=config.is_ref_device,
        )
        self.best_val_loss = math.inf
        self.best_epoch = -1
        self.highest_alignment = -math.inf
        self.start_epoch = 0

    # ------------------------------------------------------------------ #
    # setup
    # ------------------------------------------------------------------ #

    @property
    def siglip_runtime(self):
        """One typed resolution of every siglip_* runtime knob (reference
        utils/siglip/runtime_settings.py:14-199; see data/siglip_runtime.py).
        Lazy so skeleton runners built by tests resolve it from their config
        on first touch."""
        rt = getattr(self, "_siglip_runtime", None)
        if rt is None:
            from deepcoro_clip_tpu.data.siglip_runtime import (
                SiglipRuntimeSettings,
            )

            rt = SiglipRuntimeSettings.from_config(
                self.config, str(getattr(self, "output_dir", "."))
            )
            self._siglip_runtime = rt
        return rt

    def _build_datasets(self) -> Dict[str, Any]:
        cfg = self.config
        common = dict(
            data_filename=cfg.data_filename,
            root=cfg.root,
            split_column=cfg.split_column,
            datapoint_loc_label=cfg.datapoint_loc_label,
            target_label=cfg.target_label,
            multi_video=cfg.multi_video,
            num_videos=cfg.num_videos,
            groupby_column=cfg.groupby_column,
            shuffle_videos=cfg.shuffle_videos,
            frames=cfg.frames,
            stride=cfg.stride,
            resize=cfg.resize,
            seed=cfg.seed,
            wire_dtype=cfg.wire_dtype,
            mono_wire=getattr(cfg, "mono_wire", False),
        )
        if cfg.siglip_texts_path:
            from deepcoro_clip_tpu.data.siglip import (
                SiglipResources,
                SiglipVideoDataset,
            )

            edges = cfg.siglip_edges_path or str(
                Path(cfg.siglip_texts_path).parent / "edges.csv"
            )
            resources = SiglipResources(
                cfg.siglip_texts_path, edges,
                severity_weights=cfg.siglip_positive_severity_weights,
                enable_severity_weighting=cfg.siglip_enable_severity_weighting,
            )
            self.siglip_resources = resources

            sampling = self.siglip_runtime.sampling

            def make(split, augment=False):
                return SiglipVideoDataset(
                    split=split, rand_augment=augment,
                    siglip=resources,
                    max_positive_per_video=sampling.max_positive_per_video,
                    negatives_per_video=sampling.negatives_per_video,
                    round_robin=sampling.round_robin,
                    max_segments_per_video=sampling.max_segments_per_video,
                    contradiction_boost=sampling.contradiction_boost,
                    contradiction_min_severity=(
                        sampling.contradiction_min_severity
                    ),
                    **common,
                )
        else:

            def make(split, augment=False):
                return VideoClipDataset(split=split, rand_augment=augment, **common)

        out: Dict[str, Any] = {}
        if cfg.run_mode == "train":
            out["train"] = make("train", cfg.rand_augment)
            try:
                val = make("val")
                out["val"] = val if len(val) else None
            except Exception:
                out["val"] = None
        else:
            out[cfg.run_mode] = make(cfg.run_mode)
        return out

    def _resolve_stats(self) -> None:
        # must run before build_clip_bundle: the uint8 wire's patchify fold
        # reads cfg.dataset_mean/std at bundle-build time
        self.stats = resolve_dataset_stats(self.config, self.datasets)

    def _collate(self, items):
        cfg = self.config
        from deepcoro_clip_tpu.data.collate import wire_patch

        patch = wire_patch(cfg)
        max_texts = cfg.batch_size * (cfg.siglip_max_positive_per_video
                                      + cfg.siglip_negatives_per_video)
        if (self.multi_positive
                and getattr(cfg, "siglip_sampler", "pairs") == "single_head"
                and self.siglip_resources is not None):
            # batch-level reference policy (data/single_head_sampler.py);
            # ONE stateful sampler per run so round-robin coverage persists
            from deepcoro_clip_tpu.data.collate import collate_single_head

            if getattr(self, "_single_head_sampler", None) is None:
                self._single_head_sampler = (
                    self.siglip_resources.make_single_head_sampler(
                        cfg, seed=cfg.seed))
            train_ds = self.datasets.get("train")
            batch = collate_single_head(
                items, self.tokenizer, self._single_head_sampler,
                self.siglip_resources.text_by_id,
                self.siglip_resources.video_to_positives,
                epoch=getattr(train_ds, "epoch", 0),
                max_text_length=cfg.max_text_length,
                max_texts=max_texts, patch=patch,
            )
        elif self.multi_positive:
            batch = collate_multi_positive(
                items, self.tokenizer,
                max_text_length=cfg.max_text_length,
                # room for positives AND hard negatives (dedup usually leaves
                # slack; too-small a bank silently drops negatives)
                max_texts=max_texts,
                patch=patch,
            )
        else:
            # dynamic buckets are per-host batch content; multi-host SPMD
            # needs identical shapes on every host -> single-process only
            buckets = (cfg.text_length_buckets
                       if cfg.process_count == 1 else [])
            batch = collate_clip(
                items, self.tokenizer, max_text_length=cfg.max_text_length,
                length_buckets=buckets, patch=patch,
            )
        if cfg.locca_enabled:
            # LocCa generation targets: reconstructed report (SigLIP mode,
            # reference siglip_support.py:815-900) or the sample's report
            from deepcoro_clip_tpu.data.locca import locca_caption_batch

            texts = [it.get("locca_report") or it.get("text", "")
                     for it in items]
            batch.update(locca_caption_batch(
                texts, self.tokenizer, cfg.locca_max_seq_len))
        return batch

    def _make_loader(self, dataset, training: bool):
        if dataset is None:
            return None
        cfg = self.config
        sampling = self.siglip_runtime.sampling
        if training and sampling.use_class_aware_sampler and hasattr(
            dataset, "abnormal_labels"
        ):
            from deepcoro_clip_tpu.data.sampler import ClassAwareBatchSampler

            sampler = ClassAwareBatchSampler(
                dataset.abnormal_labels(), cfg.batch_size,
                abnormal_ratio=sampling.abnormal_ratio, seed=cfg.seed,
                process_index=cfg.process_index,
                process_count=cfg.process_count,
            )
        else:
            sampler = ShardedBatchSampler(
                len(dataset), cfg.batch_size, shuffle=training, seed=cfg.seed,
                drop_last=training,
                process_index=cfg.process_index, process_count=cfg.process_count,
            )
        return PrefetchLoader(
            dataset, sampler, self._collate, num_workers=max(1, cfg.num_workers),
            backend=getattr(cfg, "loader_backend", "thread"),
        )

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #

    def train(self, start_epoch: int = 0, end_epoch: Optional[int] = None) -> Dict:
        cfg = self.config
        end_epoch = end_epoch if end_epoch is not None else cfg.epochs
        patience_left = cfg.early_stopping_patience or math.inf
        history = []

        for epoch in range(start_epoch, end_epoch):
            temp = temperature_at(
                epoch, cfg.epochs, cfg.temp_schedule, cfg.temperature,
                cfg.temp_start, cfg.temp_end,
            )
            vfr = freeze_ratio_at(
                epoch, cfg.epochs, cfg.video_freeze_ratio, cfg.video_freeze_schedule
            )
            tfr = freeze_ratio_at(
                epoch, cfg.epochs, cfg.text_freeze_ratio, cfg.text_freeze_schedule
            )

            t_epoch = time.perf_counter()
            train_metrics = self._run_train_epoch(epoch, temp, vfr, tfr)
            train_metrics["epoch_seconds"] = time.perf_counter() - t_epoch
            self.logger.log({f"train/{k}": v for k, v in train_metrics.items()},
                            step=epoch)

            val_metrics: Dict[str, float] = {}
            if self.loaders.get("val") is not None:
                val_metrics = self.validate(epoch)
                self.logger.log({f"val/{k}": v for k, v in val_metrics.items()},
                                step=epoch)

            history.append({"epoch": epoch, **train_metrics,
                            **{f"val_{k}": v for k, v in val_metrics.items()}})

            # ---- checkpoint policies (reference :385-430) ----
            meta = {
                "epoch": epoch,
                "train_loss": train_metrics.get("loss"),
                "val_loss": val_metrics.get("loss"),
                "alignment": val_metrics.get("alignment"),
                "temperature": train_metrics.get("temperature"),
                "best_val_loss": self.best_val_loss,
                "best_epoch": self.best_epoch,
                "highest_alignment": self.highest_alignment,
                "dataset_mean": self.stats[0],
                "dataset_std": self.stats[1],
            }
            # best/patience tracked on EVERY host (identical metrics under
            # SPMD) so multi-host runs stay in lockstep through early stop
            val_loss = val_metrics.get("loss", train_metrics.get("loss"))
            improved = val_loss is not None and val_loss < self.best_val_loss
            if improved:
                self.best_val_loss = float(val_loss)
                self.best_epoch = epoch
                meta["best_val_loss"] = self.best_val_loss
                meta["best_epoch"] = self.best_epoch
                patience_left = cfg.early_stopping_patience or math.inf
            else:
                patience_left -= 1
            align = val_metrics.get("alignment")
            new_alignment = (
                align is not None and align > self.highest_alignment
            )
            if new_alignment:
                self.highest_alignment = float(align)
                meta["highest_alignment"] = self.highest_alignment

            if self.config.is_ref_device:
                self.ckpt.save_latest(self.state, meta)
                if improved:
                    self.ckpt.save_best(self.state, epoch, meta)
                if new_alignment:
                    self.ckpt.save_alignment(self.state, epoch, meta)

            if patience_left <= 0:
                break
        if self.config.is_ref_device:
            # end-of-run plot panels into the run dir (the reference pushes
            # these to W&B during training, utils/wandb_logger.py)
            try:
                from deepcoro_clip_tpu.utils.plot_metrics import plot_run_summary

                plot_run_summary(self.output_dir)
            except Exception:
                pass
        return {"history": history, "best_epoch": self.best_epoch,
                "best_val_loss": self.best_val_loss}

    def _run_train_epoch(self, epoch: int, temp: float, vfr: float, tfr: float):
        """Pipelined step loop: the host reads back step i's metrics only
        AFTER step i+1 has been dispatched and batch i+2's H2D transfer
        started, so the device queue never drains on the per-step readback
        (one device->host round trip per step would otherwise serialize the
        loop; see CLAUDE.md on dispatch latency). The NaN save-and-raise
        (reference :478-492) therefore fires one step late — the saved
        checkpoint is one optimizer step past the non-finite loss, which the
        error message records."""
        loader = self.loaders["train"]
        loader.set_epoch(epoch)
        agg: Dict[str, float] = {}
        n = 0
        rng = jax.random.fold_in(jax.random.PRNGKey(self.config.seed), epoch)
        pending = None  # (i, batch, device_batch, metrics) of the prior step

        def consume(entry):
            nonlocal n
            i, batch, device_batch, metrics = entry
            loss = float(metrics["loss"])  # blocks; device is already busy
            if not math.isfinite(loss):
                # The pipelined loop has already dispatched step i+1 when
                # step i's metrics are read, so detection is two dispatches
                # late. With the in-program non-finite guard (train/optim.py
                # keep_old_if_nonfinite, default on) a blown step applies NO
                # update, so the snapshot's params saw only finite updates —
                # at most two of them past the failing batch. With the guard
                # pinned off (DEEPCORO_NANGUARD=0, quality runs) the state
                # may be NaN-poisoned; either way resume falls back to the
                # last epoch checkpoint and this snapshot is debug-only.
                guarded = os.environ.get("DEEPCORO_NANGUARD", "1") == "1"
                if self.config.is_ref_device:
                    self.ckpt.save_debug(
                        "nan_debug", self.state,
                        {"epoch": epoch, "nan_loss_at_step": i,
                         "state_steps_past_failure": 2,
                         "nonfinite_update_guard": guarded},
                    )
                raise NonFiniteLossError(
                    f"non-finite loss {loss} at epoch {epoch} step {i} "
                    f"(nan_debug snapshot is two dispatches past the failure"
                    f"{', finite-updates-only' if guarded else ''}; "
                    "resume uses the last epoch checkpoint)"
                )
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
            # per-step logging (reference per-batch metrics,
            # runners/video_constrative_learning_runner.py:1510-1530)
            if i % max(1, self.config.period * 10) == 0:
                self.logger.log(
                    {f"step/{k}": float(v) for k, v in metrics.items()},
                    step=int(self.state.step),
                )
            # gated per-sample logit/grad dumps (reference siglip_debug_*
            # knobs, runner :1337-1383)
            if (
                self.multi_positive
                and self.siglip_runtime.debug.fires(epoch, i)
                and self.config.is_ref_device
            ):
                self._siglip_debug_dump(epoch, i, batch, device_batch, metrics)

        for i, batch in enumerate(loader):
            device_batch = self.bundle.batch_sharding_fn(
                {k: v for k, v in batch.items()
                 if isinstance(v, np.ndarray)}
            )
            rng, sub = jax.random.split(rng)
            self.state, metrics = self.train_step(
                self.state, device_batch, sub, vfr, tfr, temp
            )
            if pending is not None:
                consume(pending)
            pending = (i, batch, device_batch, metrics)
        if pending is not None:
            consume(pending)
        return {k: v / max(n, 1) for k, v in agg.items()}

    def _siglip_debug_dump(self, epoch, step, batch, device_batch, metrics):
        """One deterministic forward on the current params, then host-side
        per-sample positive/negative logit records + batch grad context."""
        from deepcoro_clip_tpu.utils import siglip_logging as slog

        out = self.eval_step(self.state.params, device_batch)
        params = self.state.params
        bias = float(params["logit_bias"]) if "logit_bias" in params else 0.0
        logits = slog.siglip_logits(
            np.asarray(out["video_emb"], np.float32),
            np.asarray(out["text_emb"], np.float32),
            float(params["log_temp"]),
            bias,
            self.config.siglip_logit_clamp,
        )
        weights = batch.get("positive_weights")
        records = slog.build_debug_records(
            [p[0] for p in batch["paths"]],
            batch.get("unique_texts", []),
            np.asarray(batch["positive_mask"]),
            logits,
            positive_weights=np.asarray(weights) if weights is not None else None,
            sample_count=self.config.siglip_debug_sample_count,
        )
        if not hasattr(self, "_siglip_debug"):
            self._siglip_debug = slog.SiglipDebugLogger(self.output_dir)
        self._siglip_debug.log_batch(
            epoch,
            int(self.state.step),
            records,
            header={
                # the pipelined loop means these params are ONE optimizer
                # step ahead of the step whose loss/grad metrics follow
                "params_step": int(self.state.step),
                "metrics_step": int(self.state.step) - 1,
                "loss": metrics["loss"],
                "temperature": metrics["temperature"],
                "logit_bias": bias,
                "grad_norm": metrics["grad_norm"],
                "grad_norm_video": metrics.get("grad_norm_video_encoder", 0.0),
                "grad_norm_text": metrics.get("grad_norm_text_encoder", 0.0),
            },
        )

    # ------------------------------------------------------------------ #
    # validation with retrieval metrics
    # ------------------------------------------------------------------ #

    def validate(self, epoch: int = 0, split: str = "val") -> Dict[str, float]:
        loader = self.loaders.get(split)
        if loader is None:
            return {}
        losses: List[float] = []
        v_embs: List[np.ndarray] = []
        texts: List[str] = []
        paths: List[str] = []

        def consume(batch, out):
            # one-batch-delayed readback: the next eval dispatch is already
            # in flight when these block (same pipelining as the train loop)
            losses.append(float(out["loss"]))
            n_real = len(batch["texts"]) if "texts" in batch else len(batch["paths"])
            v_embs.append(np.asarray(out["video_emb"], np.float32)[:n_real])
            if self.multi_positive:
                # keep the FULL positive set per video — retrieval is scored
                # against every positive, not just the first (reference
                # multi-label GT normalization, utils/retrieval_metrics.py:8-62)
                texts.extend(
                    [[p[0] for p in t] if t else [""] for t in
                     self._positives_of_batch(batch)]
                )
            else:
                texts.extend([[t] for t in batch["texts"]])
            paths.extend([p[0] for p in batch["paths"]])

        pending = None
        for batch in loader:
            device_batch = self.bundle.batch_sharding_fn(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            out = self.eval_step(self.state.params, device_batch)
            if pending is not None:
                consume(*pending)
            pending = (batch, out)
        if pending is not None:
            consume(*pending)

        if not v_embs:
            return {}
        v_emb = np.concatenate(v_embs)
        metrics = {"loss": float(np.mean(losses))}
        retrieval = self._retrieval_eval(v_emb, texts, epoch, split,
                                         paths=paths)
        metrics.update(retrieval)
        return metrics

    @staticmethod
    def _positives_of_batch(batch):
        uniq = batch.get("unique_texts", [])
        pos = batch.get("positive_mask")
        out = []
        for row in np.asarray(pos):
            idx = np.flatnonzero(row)
            out.append([(uniq[j], 1.0) for j in idx if j < len(uniq)])
        return out

    def _encode_texts(self, unique_texts: List[str], batch_size: int = 64):
        """Unique-text re-encode in fixed-size batches (reference :904-941)."""
        embs = []
        n = len(unique_texts)
        for i in range(0, n, batch_size):
            chunk = unique_texts[i : i + batch_size]
            pad = batch_size - len(chunk)
            enc = self.tokenizer(
                chunk + [""] * pad, max_length=self.config.max_text_length,
                padding="max_length", truncation=True, return_tensors="np",
            )
            e = self._text_encode(
                self.state.params,
                jnp.asarray(enc["input_ids"], jnp.int32),
                jnp.asarray(enc["attention_mask"], jnp.int32),
            )
            embs.append(np.asarray(e, np.float32)[: len(chunk)])
        return np.concatenate(embs) if embs else np.zeros((0, 1), np.float32)

    def _retrieval_eval(self, v_emb, texts, epoch, split,
                        paths: Optional[List[str]] = None) -> Dict[str, float]:
        """Dedup -> encode -> NxM similarity -> metrics -> artifacts
        (reference :853-1021).

        ``texts``: per-video list of POSITIVE texts (singleton lists in plain
        CLIP mode). The GT matrix marks every positive, so multi-positive
        validation scores against the full positive set (reference
        utils/retrieval_metrics.py:8-62), not the first positive only.
        """
        cfg = self.config
        uniq: Dict[str, int] = {}
        pos_ids: List[List[int]] = []
        for tl in texts:
            ids = []
            for t in tl:
                if t not in uniq:
                    uniq[t] = len(uniq)
                ids.append(uniq[t])
            pos_ids.append(ids)
        unique_texts = list(uniq)
        if not unique_texts or len(v_emb) == 0:
            return {}
        # primary positive per video (first) for alignment + artifacts
        text_ids = [ids[0] for ids in pos_ids]
        t_emb = self._encode_texts(unique_texts)

        vn = v_emb / np.maximum(np.linalg.norm(v_emb, axis=1, keepdims=True), 1e-8)
        tn = t_emb / np.maximum(np.linalg.norm(t_emb, axis=1, keepdims=True), 1e-8)
        sim = vn @ tn.T
        gt = np.zeros((len(v_emb), len(unique_texts)), dtype=bool)
        for i, ids in enumerate(pos_ids):
            gt[i, ids] = True
        metrics = compute_retrieval_metrics(
            sim, gt, recall_k=cfg.recall_k, ndcg_k=cfg.ndcg_k
        )
        metrics["alignment"] = compute_alignment_score(
            v_emb, t_emb[np.asarray(text_ids)]
        )

        if (getattr(self, "multi_positive", False)
                and getattr(self, "siglip_resources", None) is not None):
            # tree/segment/severity-aware panel (reference
            # utils/semantic_metrics.py:69-232) keyed here by text STRING —
            # metadata resolved through the siglip text catalog
            from deepcoro_clip_tpu.utils.semantic_metrics import (
                compute_semantic_metrics,
            )

            res = self.siglip_resources
            meta_by_text = {}
            for tid, meta in res.meta_by_id.items():
                meta_by_text.setdefault(res.text_by_id.get(tid, ""), meta)
            metrics.update(compute_semantic_metrics(
                sim,
                [[t for t in tl] for tl in texts],
                meta_by_text,
                unique_texts,
            ))

        if cfg.is_ref_device:
            # artifacts (reference saves val_unique_texts.csv + text emb .pt
            # + per-video retrieval CSV, utils/wandb_logger.py:908)
            art = self.output_dir / split
            art.mkdir(parents=True, exist_ok=True)
            pd.DataFrame({"text": unique_texts}).to_csv(
                art / f"unique_texts_epoch_{epoch}.csv", index=False
            )
            np.savez(
                art / f"text_embeddings_epoch_{epoch}.npz",
                text_embeddings=t_emb, video_embeddings=v_emb,
            )
            k = min(5, sim.shape[1])
            topk = np.argsort(-sim, axis=1)[:, :k]
            rows = []
            for i in range(len(v_emb)):
                # best rank over the positive set (multi-label GT)
                gt_rank = int(
                    1 + min(np.sum(sim[i] > sim[i, j]) for j in pos_ids[i])
                )
                rows.append({
                    "path": (paths[i] if paths and i < len(paths) else ""),
                    "gt_text": unique_texts[text_ids[i]],
                    "gt_rank": gt_rank,
                    **{f"top{j+1}_text": unique_texts[t]
                       for j, t in enumerate(topk[i])},
                    **{f"top{j+1}_score": float(sim[i, t])
                       for j, t in enumerate(topk[i])},
                })
            pd.DataFrame(rows).to_csv(
                art / f"retrieval_results_epoch_{epoch}.csv", index=False
            )
            # best/worst qualitative HTML panel (reference
            # utils/siglip_logging.py:106-484, wandb_logger.py:625-807)
            from deepcoro_clip_tpu.utils.qualitative import (
                write_retrieval_report,
            )

            write_retrieval_report(
                art / f"qualitative_epoch_{epoch}.html",
                [
                    {
                        "path": r["path"], "gt_text": r["gt_text"],
                        "gt_rank": r["gt_rank"],
                        "topk_texts": [r[f"top{j+1}_text"]
                                       for j in range(k)],
                        "topk_scores": [r[f"top{j+1}_score"]
                                        for j in range(k)],
                    }
                    for r in rows
                ],
                title=f"{split} retrieval epoch {epoch}",
            )
            # best/worst VIDEO panels (animated GIF + PNG grid; reference
            # wandb_logger.log_best_worst_retrievals:625-807)
            from deepcoro_clip_tpu.utils.qualitative import (
                log_best_worst_retrievals,
            )

            log_best_worst_retrievals(
                sim, paths or [""] * len(v_emb), unique_texts,
                [ids[0] for ids in pos_ids], epoch, art,
                logger=self.logger,
                ground_truth_texts=[[unique_texts[j] for j in ids]
                                    for ids in pos_ids],
            )
        return metrics

    # ------------------------------------------------------------------ #
    # inference (reference :1731-1826)
    # ------------------------------------------------------------------ #

    def inference(self) -> pd.DataFrame:
        cfg = self.config
        bank = np.load(cfg.text_embeddings_path)
        t_emb = bank["text_embeddings"] if hasattr(bank, "files") else np.asarray(bank)
        metadata = (
            pd.read_parquet(cfg.metadata_path)
            if str(cfg.metadata_path).endswith("parquet")
            else pd.read_csv(cfg.metadata_path)
        )
        loader = self.loaders.get(cfg.run_mode) or next(iter(self.loaders.values()))

        tn = t_emb / np.maximum(np.linalg.norm(t_emb, axis=1, keepdims=True), 1e-8)
        rows = []
        for batch in loader:
            device_batch = self.bundle.batch_sharding_fn(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            out = self.eval_step(self.state.params, device_batch)
            n_real = len(batch["paths"])  # drop device-padding rows
            v = np.asarray(out["video_emb"], np.float32)[:n_real]
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-8)
            sim = v @ tn.T
            topk = np.argsort(-sim, axis=1)[:, : cfg.topk]
            for b, idxs in enumerate(topk):
                sel = metadata.iloc[idxs]
                row: Dict[str, Any] = {
                    "path": batch["paths"][b][0] if batch.get("paths") else "",
                    "topk_indices": list(map(int, idxs)),
                    "topk_scores": [float(sim[b, j]) for j in idxs],
                }
                # numeric columns averaged, string columns mode (reference
                # :1768-1804)
                for col in metadata.columns:
                    vals = sel[col]
                    if pd.api.types.is_numeric_dtype(vals):
                        row[col] = float(vals.mean())
                    else:
                        row[col] = vals.mode().iloc[0] if len(vals.mode()) else ""
                rows.append(row)
        df = pd.DataFrame(rows)
        if cfg.is_ref_device:
            out_dir = Path(cfg.inference_results_path)
            out_dir.mkdir(parents=True, exist_ok=True)
            df.to_csv(out_dir / "averaged_metadata.csv", index=False)
        return df

    # ------------------------------------------------------------------ #
    # resume
    # ------------------------------------------------------------------ #

    def restore_best(self, fallback_latest: bool = True) -> bool:
        """Load the best-val-loss checkpoint (reference loads best_model for
        val/inference, projects/contrastive_pretraining_project.py:285-287);
        falls back to the latest checkpoint."""
        name = self.ckpt.find_best()
        if name is None and fallback_latest and self.ckpt.latest_exists():
            name = "checkpoint"
        if name is None:
            return False
        self.state = self.ckpt.restore(self.state, name)
        return True

    def maybe_resume(self) -> int:
        if self.config.resume_training and self.ckpt.latest_exists():
            self.state = self.ckpt.restore(self.state, "checkpoint")
            meta = self.ckpt.load_meta("checkpoint") or {}
            self.best_val_loss = float(meta.get("best_val_loss", math.inf))
            self.best_epoch = int(meta.get("best_epoch", -1))
            # without this, the first post-resume epoch would overwrite and
            # prune the genuinely highest-alignment checkpoint
            self.highest_alignment = float(
                meta.get("highest_alignment", -math.inf))
            self.start_epoch = int(meta.get("epoch", -1)) + 1
        return self.start_epoch
