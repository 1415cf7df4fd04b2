"""Multitask runner: joint contrastive + captioning + MVM training.

Reference: runners/multitask_runner.py:56-1775 — one backbone token pass per
step feeding all tasks, loss-weight scheduler, stenosis-aware caption
weighting from decoded texts, captioning metrics (BLEU/ROUGE).
"""

from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from deepcoro_clip_tpu.data.collate import collate_clip
from deepcoro_clip_tpu.data.datasets import VideoClipDataset
from deepcoro_clip_tpu.data.loader import PrefetchLoader
from deepcoro_clip_tpu.data.sampler import ShardedBatchSampler
from deepcoro_clip_tpu.data.tokenizer import get_tokenizer
from deepcoro_clip_tpu.losses.multitask import LossWeightScheduler
from deepcoro_clip_tpu.models.captioning_decoder import greedy_generate_kv
from deepcoro_clip_tpu.runners.common import make_runner_mesh, resolve_dataset_stats
from deepcoro_clip_tpu.registry import RunnerRegistry
from deepcoro_clip_tpu.runners.contrastive import NonFiniteLossError
from deepcoro_clip_tpu.train.run_schedules import freeze_ratio_at, temperature_at
from deepcoro_clip_tpu.train import multitask as mt_train
from deepcoro_clip_tpu.train.checkpoint import CheckpointManager
from deepcoro_clip_tpu.utils.caption_metrics import captioning_metrics
from deepcoro_clip_tpu.utils.logging_utils import MetricsLogger
from deepcoro_clip_tpu.utils.stenosis_extractor import StenosisExtractor


@RunnerRegistry.register("DeepCORO_multitask")
class MultitaskRunner:
    def __init__(self, config, output_dir: Optional[str] = None, mesh=None):
        self.config = config
        self.output_dir = Path(output_dir or config.output_dir)
        self.mesh = mesh if mesh is not None else make_runner_mesh(config)
        self.tokenizer = get_tokenizer(
            vocab_size=config.text_vocab_size, max_length=config.max_text_length
        )
        self.extractor = StenosisExtractor()
        self.datasets = self._build_datasets()
        self._resolve_stats()
        self.loaders = {
            s: self._make_loader(d, s == "train")
            for s, d in self.datasets.items() if d is not None
        }
        steps = max(1, len(self.loaders.get("train", [])) or 1)
        self.bundle, self.state = mt_train.build_multitask_bundle(
            config, self.mesh, jax.random.PRNGKey(config.seed),
            steps_per_epoch=steps,
        )
        self.train_step = mt_train.make_multitask_train_step(self.bundle)
        # built once: a fresh jit-wrapped lambda per validate() call would
        # recompile the multitask forward every epoch
        self._val_fwd = jax.jit(
            functools.partial(mt_train.multitask_forward, self.bundle,
                              deterministic=True)
        )
        self.weight_sched = LossWeightScheduler(
            dict(config.loss_weights), config.loss_weight_schedule
        )
        self.ckpt = CheckpointManager(self.output_dir / "checkpoints")
        self.logger = MetricsLogger(
            self.output_dir, use_wandb=config.use_wandb, config=config,
            is_ref_device=config.is_ref_device,
        )
        self.best_val_loss = math.inf
        self.best_epoch = -1
        self.global_step = 0
        self.start_epoch = 0

    # ------------------------------------------------------------------ #

    def _build_datasets(self):
        cfg = self.config
        common = dict(
            data_filename=cfg.data_filename, root=cfg.root,
            split_column=cfg.split_column,
            datapoint_loc_label=cfg.datapoint_loc_label,
            target_label=cfg.target_label, multi_video=cfg.multi_video,
            num_videos=cfg.num_videos, groupby_column=cfg.groupby_column,
            shuffle_videos=cfg.shuffle_videos, frames=cfg.frames,
            stride=cfg.stride, resize=cfg.resize, seed=cfg.seed,
            wire_dtype=cfg.wire_dtype,
            mono_wire=getattr(cfg, "mono_wire", False),
        )
        out = {"train": VideoClipDataset(split="train",
                                         rand_augment=cfg.rand_augment, **common)}
        try:
            val = VideoClipDataset(split="val", **common)
            out["val"] = val if len(val) else None
        except Exception:
            out["val"] = None
        return out

    def _resolve_stats(self):
        self.stats = resolve_dataset_stats(self.config, self.datasets)

    def _collate(self, items):
        cfg = self.config
        from deepcoro_clip_tpu.data.collate import wire_patch

        buckets = (cfg.text_length_buckets if cfg.process_count == 1 else [])
        batch = collate_clip(items, self.tokenizer,
                             max_text_length=cfg.max_text_length,
                             length_buckets=buckets, patch=wire_patch(cfg))
        cap = self.tokenizer(
            batch["texts"], max_length=cfg.decoder_max_length,
            padding="max_length", truncation=True, return_tensors="np",
        )
        batch["caption_ids"] = np.asarray(cap["input_ids"], np.int32)
        batch["caption_mask"] = np.asarray(cap["attention_mask"], np.int32)
        if cfg.locca_enabled:
            from deepcoro_clip_tpu.data.locca import location_token_mask

            batch["location_mask"] = location_token_mask(
                batch["texts"], self.tokenizer, cfg.decoder_max_length
            )
        # stenosis-aware per-sample caption weights (reference :854-876)
        batch["caption_weights"] = np.asarray(
            [self.extractor.max_severity_weight(t) for t in batch["texts"]],
            np.float32,
        )
        return batch

    def _make_loader(self, dataset, training):
        if dataset is None:
            return None
        cfg = self.config
        sampler = ShardedBatchSampler(
            len(dataset), cfg.batch_size, shuffle=training, seed=cfg.seed,
            drop_last=training, process_index=cfg.process_index,
            process_count=cfg.process_count,
        )
        return PrefetchLoader(dataset, sampler, self._collate,
                              num_workers=max(1, cfg.num_workers),
                              backend=getattr(cfg, "loader_backend", "thread"))

    # ------------------------------------------------------------------ #

    def maybe_resume(self) -> int:
        """Resume from the latest checkpoint (reference resume path,
        projects/contrastive_pretraining_project.py:296-331)."""
        if self.config.resume_training and self.ckpt.latest_exists():
            self.state = self.ckpt.restore(self.state, "checkpoint")
            meta = self.ckpt.load_meta("checkpoint") or {}
            self.best_val_loss = float(meta.get("best_val_loss", math.inf))
            self.best_epoch = int(meta.get("best_epoch", -1))
            self.global_step = int(meta.get("global_step", 0))
            self.start_epoch = int(meta.get("epoch", -1)) + 1
        return self.start_epoch

    def train(self, start_epoch: int = 0, end_epoch: Optional[int] = None):
        cfg = self.config
        end_epoch = end_epoch or cfg.epochs
        patience_left = cfg.early_stopping_patience or math.inf
        history = []
        for epoch in range(start_epoch, end_epoch):
            # epoch-folded RNG (like the contrastive runner): a resumed run
            # must not replay epoch 0's dropout/MVM-mask stream
            rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch)
            # epoch-level schedules (reference multitask loop mirrors the
            # contrastive runner's, runners/multitask_runner.py)
            vfr = freeze_ratio_at(epoch, cfg.epochs, cfg.video_freeze_ratio,
                                  cfg.video_freeze_schedule)
            tfr = freeze_ratio_at(epoch, cfg.epochs, cfg.text_freeze_ratio,
                                  cfg.text_freeze_schedule)
            temp = temperature_at(
                epoch, cfg.epochs, cfg.temp_schedule,
                cfg.temperature, cfg.temp_start, cfg.temp_end,
            )
            loader = self.loaders["train"]
            loader.set_epoch(epoch)
            agg: Dict[str, float] = {}
            n = 0
            pending = None  # pipelined readback (see contrastive runner)

            def consume(entry):
                nonlocal n
                i, metrics = entry
                loss = float(metrics["loss"])
                if not np.isfinite(loss):
                    # NaN save-and-raise (reference :478-492). The pipelined
                    # loop makes self.state two updates past the failure and
                    # likely NaN-poisoned — keep it out of the resumable
                    # checkpoint tree.
                    if cfg.is_ref_device:
                        self.ckpt.save_debug(
                            "nan_debug", self.state,
                            {"epoch": epoch, "nan_loss_at_step": i,
                             "state_steps_past_failure": 2},
                        )
                    raise NonFiniteLossError(
                        f"non-finite loss {loss} at epoch {epoch} step {i} "
                        "(nan_debug snapshot; resume uses the last epoch "
                        "checkpoint)"
                    )
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                n += 1

            for i, batch in enumerate(loader):
                w = self.weight_sched.at(self.global_step)
                db = self.bundle.batch_sharding_fn(
                    {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray)}
                )
                rng, sub = jax.random.split(rng)
                self.state, metrics = self.train_step(
                    self.state, db, sub,
                    w.get("contrastive", 1.0), w.get("captioning", 1.0),
                    w.get("mvm", 1.0), vfr, tfr, temp,
                )
                self.global_step += 1
                if pending is not None:
                    consume(pending)
                pending = (i, metrics)
            if pending is not None:
                consume(pending)
            train_metrics = {k: v / max(n, 1) for k, v in agg.items()}
            self.logger.log({f"train/{k}": v for k, v in train_metrics.items()},
                            step=epoch)

            val_metrics = {}
            if self.loaders.get("val") is not None:
                val_metrics = self.validate(epoch)
                self.logger.log({f"val/{k}": v for k, v in val_metrics.items()},
                                step=epoch)
            history.append({"epoch": epoch, **train_metrics,
                            **{f"val_{k}": v for k, v in val_metrics.items()}})

            vl = val_metrics.get("loss", train_metrics.get("loss"))
            improved = vl is not None and vl < self.best_val_loss
            if improved:
                self.best_val_loss = float(vl)
                self.best_epoch = epoch
                patience_left = cfg.early_stopping_patience or math.inf
            else:
                patience_left -= 1
            if cfg.is_ref_device:
                meta = {"epoch": epoch, "best_val_loss": self.best_val_loss,
                        "best_epoch": self.best_epoch,
                        "global_step": self.global_step, **train_metrics}
                self.ckpt.save_latest(self.state, meta)
                if improved:
                    self.ckpt.save_best(self.state, epoch, meta)
            if patience_left <= 0:
                break
        if cfg.is_ref_device:
            # end-of-run plot panels (reference wandb_logger role)
            try:
                from deepcoro_clip_tpu.utils.plot_metrics import plot_run_summary

                plot_run_summary(self.output_dir)
            except Exception:
                pass
        return {"history": history, "best_epoch": self.best_epoch,
                "best_val_loss": self.best_val_loss}

    # ------------------------------------------------------------------ #

    def _decode_ids(self, ids) -> str:
        """ids -> text via the tokenizer's decode when it has one (WordPiece/
        HF); deterministic id-string fallback for the hash tokenizer."""
        ids = [int(t) for t in np.asarray(ids) if int(t) > 0]
        if hasattr(self.tokenizer, "decode"):
            try:
                return self.tokenizer.decode(ids, skip_special_tokens=True)
            except TypeError:  # pragma: no cover - exotic HF signatures
                return self.tokenizer.decode(ids)
        return " ".join(map(str, ids))

    def validate(self, epoch: int = 0) -> Dict[str, float]:
        cfg = self.config
        loader = self.loaders.get("val")
        if loader is None:
            return {}
        losses = []
        gen_texts: List[str] = []
        ref_texts: List[str] = []
        fwd = self._val_fwd
        gen_len = min(32, cfg.decoder_max_length)
        for batch in loader:
            n_real = len(batch["texts"])
            db = self.bundle.batch_sharding_fn(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            out = fwd(self.state.params, db, jax.random.PRNGKey(0))
            # val objective uses the SAME task weights as training at this
            # step — otherwise best-checkpoint/early-stop track a different
            # objective (e.g. an untrained mvm head when w_mvm=0)
            w = self.weight_sched.at(self.global_step)
            losses.append(
                w.get("contrastive", 1.0) * float(out["contrastive"])
                + w.get("captioning", 1.0) * float(out["captioning"])
                + w.get("mvm", 1.0) * float(out["mvm"])
            )
            # greedy captions over the FULL validation split (reference
            # computes BLEU/ROUGE on all val captions,
            # runners/multitask_runner.py:1356-1503), KV-cache decoding.
            # video tokens come from the SAME forward that produced the
            # losses — one backbone pass per val batch
            toks = out["video_tokens"]
            from deepcoro_clip_tpu.data.tokenizer import CLS_ID, SEP_ID

            ids = greedy_generate_kv(
                self.bundle.decoder,
                {"params": self.state.params["decoder"]},
                toks, bos_id=CLS_ID, eos_id=SEP_ID,
                max_length=gen_len,
            )
            for i in range(n_real):
                gen_texts.append(self._decode_ids(ids[i]))
                ref_texts.append(self._decode_ids(batch["caption_ids"][i]))
        metrics = {"loss": float(np.mean(losses)) if losses else 0.0}
        if gen_texts:
            metrics.update(captioning_metrics(gen_texts, ref_texts))
            if cfg.is_ref_device:
                import pandas as pd

                art = self.output_dir / "val"
                art.mkdir(parents=True, exist_ok=True)
                pd.DataFrame({"generated": gen_texts,
                              "reference": ref_texts}).to_csv(
                    art / f"captions_epoch_{epoch}.csv", index=False)
        return metrics
