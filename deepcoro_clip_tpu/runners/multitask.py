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
from deepcoro_clip_tpu.data.datasets import StatsDataset, VideoClipDataset
from deepcoro_clip_tpu.data.loader import PrefetchLoader
from deepcoro_clip_tpu.data.sampler import ShardedBatchSampler
from deepcoro_clip_tpu.data.tokenizer import get_tokenizer
from deepcoro_clip_tpu.losses.multitask import LossWeightScheduler
from deepcoro_clip_tpu.models.captioning_decoder import greedy_generate
from deepcoro_clip_tpu.parallel.mesh import MeshSpec, make_mesh
from deepcoro_clip_tpu.registry import RunnerRegistry
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
        if mesh is None:
            import math as _math

            model = max(1, config.mesh_model)
            avail = jax.device_count() // model
            data = config.mesh_data if config.mesh_data > 0 else avail
            data = _math.gcd(data, config.batch_size) or 1
            mesh = make_mesh(MeshSpec(data=data, model=model))
        self.mesh = mesh
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
        cfg = self.config
        mean, std = cfg.dataset_mean or cfg.data_mean, cfg.dataset_std or cfg.data_std
        if mean is None:
            mean, std = StatsDataset(self.datasets["train"]).compute()
            mean, std = mean.tolist(), std.tolist()
        self.stats = (list(map(float, mean)), list(map(float, std)))
        # uint8 wire: on-device normalization reads these from the config
        cfg.dataset_mean, cfg.dataset_std = self.stats
        if cfg.wire_dtype == "float32":
            for ds in self.datasets.values():
                if ds is not None:
                    ds.mean, ds.std = self.stats

    def _collate(self, items):
        cfg = self.config
        buckets = (cfg.text_length_buckets if cfg.process_count == 1 else [])
        batch = collate_clip(items, self.tokenizer,
                             max_text_length=cfg.max_text_length,
                             length_buckets=buckets)
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
                              num_workers=max(1, cfg.num_workers))

    # ------------------------------------------------------------------ #

    def train(self, start_epoch: int = 0, end_epoch: Optional[int] = None):
        cfg = self.config
        end_epoch = end_epoch or cfg.epochs
        history = []
        rng = jax.random.PRNGKey(cfg.seed)
        for epoch in range(start_epoch, end_epoch):
            loader = self.loaders["train"]
            loader.set_epoch(epoch)
            agg: Dict[str, float] = {}
            n = 0
            for batch in loader:
                w = self.weight_sched.at(self.global_step)
                db = self.bundle.batch_sharding_fn(
                    {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray)}
                )
                rng, sub = jax.random.split(rng)
                self.state, metrics = self.train_step(
                    self.state, db, sub,
                    w.get("contrastive", 1.0), w.get("captioning", 1.0),
                    w.get("mvm", 1.0),
                )
                self.global_step += 1
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                n += 1
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

            if cfg.is_ref_device:
                meta = {"epoch": epoch, **train_metrics}
                self.ckpt.save_latest(self.state, meta)
                vl = val_metrics.get("loss", train_metrics.get("loss"))
                if vl is not None and vl < self.best_val_loss:
                    self.best_val_loss = float(vl)
                    self.best_epoch = epoch
                    self.ckpt.save_best(self.state, epoch, meta)
        return {"history": history, "best_epoch": self.best_epoch,
                "best_val_loss": self.best_val_loss}

    # ------------------------------------------------------------------ #

    def validate(self, epoch: int = 0) -> Dict[str, float]:
        cfg = self.config
        loader = self.loaders.get("val")
        if loader is None:
            return {}
        losses = []
        gen_texts: List[str] = []
        ref_texts: List[str] = []
        fwd = self._val_fwd
        for batch in loader:
            n_real = len(batch["texts"])
            db = self.bundle.batch_sharding_fn(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            out = fwd(self.state.params, db, jax.random.PRNGKey(0))
            losses.append(
                float(out["contrastive"]) + float(out["captioning"])
                + float(out["mvm"])
            )
            # greedy captions on the first val batch only (costly)
            if not gen_texts:
                feats = self.bundle.video_model.apply(
                    {"params": self.state.params["video_encoder"]},
                    db["videos"], deterministic=True,
                    method=self.bundle.video_model.features,
                )
                B, N, L, D = feats["tokens"].shape
                toks = feats["tokens"].reshape(B, N * L, D)
                from deepcoro_clip_tpu.data.tokenizer import CLS_ID, SEP_ID

                ids = greedy_generate(
                    self.bundle.decoder,
                    {"params": self.state.params["decoder"]},
                    toks, bos_id=CLS_ID, eos_id=SEP_ID,
                    max_length=min(16, cfg.decoder_max_length),
                )
                for i in range(n_real):
                    toks_i = [int(t) for t in np.asarray(ids[i]) if t > 0]
                    gen_texts.append(" ".join(map(str, toks_i)))
                    ref_ids = [int(t) for t in batch["caption_ids"][i] if t > 0]
                    ref_texts.append(" ".join(map(str, ref_ids)))
        metrics = {"loss": float(np.mean(losses)) if losses else 0.0}
        if gen_texts:
            metrics.update(captioning_metrics(gen_texts, ref_texts))
        return metrics
