"""Linear-probing / MIL runner.

Reference: runners/linear_probing_runner.py:42-1321 — multi-head train/val/
test/inference; per-head metrics with optional bootstrap CIs
(_compute_heads_metrics:1249), prediction CSVs (_save_predictions:885),
metrics JSON (:1002), study-embedding capture in inference (:700-751),
latest+best checkpoint retention (:828-883).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import pandas as pd

from deepcoro_clip_tpu.data.collate import collate_mil
from deepcoro_clip_tpu.data.datasets import VideoDataset
from deepcoro_clip_tpu.data.loader import PrefetchLoader
from deepcoro_clip_tpu.data.sampler import ShardedBatchSampler
from deepcoro_clip_tpu.runners.common import make_runner_mesh, resolve_dataset_stats
from deepcoro_clip_tpu.registry import RunnerRegistry
from deepcoro_clip_tpu.train import linear_probe as probe_train
from deepcoro_clip_tpu.train.checkpoint import CheckpointManager
from deepcoro_clip_tpu.utils.logging_utils import MetricsLogger
from deepcoro_clip_tpu.utils.metrics import compute_head_metrics


@RunnerRegistry.register("DeepCORO_video_linear_probing")
class LinearProbingRunner:
    def __init__(self, config, output_dir: Optional[str] = None, mesh=None,
                 encoder_params=None, datasets: Optional[Dict[str, Any]] = None):
        self.config = config
        self.output_dir = Path(output_dir or config.output_dir)
        self.mesh = mesh if mesh is not None else make_runner_mesh(config)

        if encoder_params is None and config.video_encoder_checkpoint_path:
            encoder_params = self._load_encoder_checkpoint(
                config.video_encoder_checkpoint_path
            )

        self.datasets = datasets if datasets is not None else self._build_datasets()
        self._resolve_stats()
        self.loaders = {
            s: self._make_loader(d, s == "train")
            for s, d in self.datasets.items() if d is not None
        }
        steps = max(1, len(self.loaders.get("train", [])) or 1)
        self.bundle, self.state = probe_train.build_probe_bundle(
            config, self.mesh, jax.random.PRNGKey(config.seed),
            steps_per_epoch=steps, encoder_params=encoder_params,
        )
        self.train_step = probe_train.make_probe_train_step(self.bundle)
        self.eval_step = probe_train.make_probe_eval_step(self.bundle)
        self.ckpt = CheckpointManager(self.output_dir / "checkpoints")
        self.logger = MetricsLogger(
            self.output_dir, use_wandb=config.use_wandb, config=config,
            is_ref_device=config.is_ref_device,
        )
        self.best_val_loss = math.inf
        self.best_epoch = -1

    # ------------------------------------------------------------------ #

    @staticmethod
    def _load_encoder_checkpoint(path: str):
        """Pull the video-encoder subtree out of a CLIP run checkpoint
        (reference loads checkpoint["video_encoder"] and repairs DDP
        prefixes, projects/linear_probing_project.py:199-200, 516-544)."""
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(Path(path).resolve())
        params = restored.get("params", restored)
        return params.get("video_encoder", params)

    def _build_datasets(self) -> Dict[str, Any]:
        cfg = self.config
        target_cols = sorted(
            {col for head, col in self._head_to_column().items()}
        )
        common = dict(
            data_filename=cfg.data_filename,
            root=cfg.root,
            split_column=cfg.split_column,
            datapoint_loc_label=cfg.datapoint_loc_label,
            multi_video=cfg.multi_video,
            num_videos=cfg.num_videos,
            groupby_column=cfg.groupby_column,
            shuffle_videos=cfg.shuffle_videos,
            frames=cfg.frames,
            stride=cfg.stride,
            resize=cfg.resize,
            seed=cfg.seed,
            target_labels=target_cols,
            labels_map=cfg.labels_map,
            view_column=cfg.view_column,
            num_view_classes=cfg.num_view_classes,
            view_labels_map=getattr(cfg, "view_labels_map", None),
            wire_dtype=cfg.wire_dtype,
            mono_wire=getattr(cfg, "mono_wire", False),
        )
        splits = (
            ["train", "val"] if cfg.run_mode == "train" else [cfg.run_mode]
        )
        # non-train modes may target an arbitrary Split value (reference
        # PCI_comparison: split_filter diagnostic/POST_PCI over one CSV)
        split_of = {
            s: (getattr(cfg, "split_filter", None) or s)
            if cfg.run_mode != "train" else s
            for s in splits
        }
        out = {}
        for s in splits:
            try:
                ds = VideoDataset(split=split_of[s], rand_augment=cfg.rand_augment and s == "train", **common)
                out[s] = ds if len(ds) else None
            except Exception:
                out[s] = None
        return out

    def _head_to_column(self) -> Dict[str, str]:
        """Head name -> label column. By convention the head name IS the
        column name (the reference's head_structure maps heads to label
        columns via config dicts)."""
        return {h: h for h in self.config.head_structure}

    def _resolve_stats(self):
        self.stats = resolve_dataset_stats(self.config, self.datasets)

    def _make_loader(self, dataset, training):
        if dataset is None:
            return None
        cfg = self.config
        sampler = ShardedBatchSampler(
            len(dataset), cfg.batch_size, shuffle=training, seed=cfg.seed,
            drop_last=training, process_index=cfg.process_index,
            process_count=cfg.process_count,
        )
        from deepcoro_clip_tpu.data.collate import wire_patch

        collate = lambda items: collate_mil(
            items, list(cfg.head_structure), patch=wire_patch(cfg))
        return PrefetchLoader(dataset, sampler, collate,
                              num_workers=max(1, cfg.num_workers),
                              backend=getattr(cfg, "loader_backend", "thread"))

    # ------------------------------------------------------------------ #

    def train(self, start_epoch: int = 0, end_epoch: Optional[int] = None):
        cfg = self.config
        end_epoch = end_epoch or cfg.epochs
        patience_left = cfg.early_stopping_patience or math.inf
        history = []
        rng = jax.random.PRNGKey(cfg.seed)
        for epoch in range(start_epoch, end_epoch):
            loader = self.loaders["train"]
            loader.set_epoch(epoch)
            agg: Dict[str, float] = {}
            n = 0
            pending = None  # pipelined readback (see contrastive runner)
            for batch in loader:
                db = self.bundle.batch_sharding_fn(self._device_part(batch))
                rng, sub = jax.random.split(rng)
                self.state, metrics = self.train_step(
                    self.state, db, sub, cfg.video_freeze_ratio
                )
                if pending is not None:
                    for k, v in pending.items():
                        agg[k] = agg.get(k, 0.0) + float(v)
                    n += 1
                pending = metrics
            if pending is not None:
                for k, v in pending.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                n += 1
            train_metrics = {k: v / max(n, 1) for k, v in agg.items()}
            self.logger.log({f"train/{k}": v for k, v in train_metrics.items()},
                            step=epoch)

            val_metrics = {}
            if self.loaders.get("val") is not None:
                val_metrics = self.validate(split="val", epoch=epoch)
                self.logger.log(
                    {f"val/{k}": v for k, v in val_metrics.items()
                     if isinstance(v, (int, float))},
                    step=epoch,
                )
            history.append({"epoch": epoch, **train_metrics,
                            **{f"val_{k}": v for k, v in val_metrics.items()
                               if isinstance(v, (int, float))}})

            meta = {"epoch": epoch, "train_loss": train_metrics.get("loss"),
                    "val_loss": val_metrics.get("loss"),
                    "dataset_mean": self.stats[0],
                    "dataset_std": self.stats[1]}
            # patience tracked on every host (multi-host lockstep)
            vl = val_metrics.get("loss", train_metrics.get("loss"))
            improved = vl is not None and vl < self.best_val_loss
            if improved:
                self.best_val_loss = float(vl)
                self.best_epoch = epoch
                patience_left = cfg.early_stopping_patience or math.inf
            else:
                patience_left -= 1
            meta["best_val_loss"] = self.best_val_loss
            meta["best_epoch"] = self.best_epoch
            if cfg.is_ref_device:
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

    @staticmethod
    def _device_part(batch):
        return {k: v for k, v in batch.items()
                if isinstance(v, (np.ndarray, dict))}

    # ------------------------------------------------------------------ #

    def validate(self, split: str = "val", epoch: int = 0,
                 save_predictions: bool = True) -> Dict[str, Any]:
        cfg = self.config
        loader = self.loaders.get(split)
        if loader is None:
            return {}
        heads = list(cfg.head_structure)
        preds: Dict[str, List[np.ndarray]] = {h: [] for h in heads}
        targets: Dict[str, List[np.ndarray]] = {h: [] for h in heads}
        study_ids: List[str] = []
        losses = []
        for batch in loader:
            n_real = len(batch["study_ids"])
            db = self.bundle.batch_sharding_fn(self._device_part(batch))
            out = self.eval_step(self.state.params, db)
            losses.append(float(out["loss"]))
            for h in heads:
                preds[h].append(np.asarray(out["outputs"][h], np.float32)[:n_real])
                targets[h].append(np.asarray(batch["targets"][h])[:n_real])
            study_ids.extend(batch["study_ids"])

        metrics: Dict[str, Any] = {"loss": float(np.mean(losses)) if losses else 0.0}
        rows: Dict[str, Any] = {"study_id": study_ids}
        for h in heads:
            p = np.concatenate(preds[h])
            t = np.concatenate(targets[h])
            from deepcoro_clip_tpu.utils.metrics import normalize_head_task

            task = normalize_head_task(cfg.head_task.get(h, "binary"))
            if task != "multiclass":
                p_flat = p.reshape(len(p), -1)[:, 0]
            else:
                p_flat = p.argmax(-1)
            rows[f"{h}_pred"] = p_flat.tolist()
            rows[f"{h}_target"] = t.reshape(len(t)).tolist()
            hm = compute_head_metrics(
                p if task == "multiclass" else p_flat, t, task,
                with_ci=cfg.run_mode in ("val", "test"),
                n_bootstrap=cfg.ci_n_bootstrap,
                confidence=cfg.ci_confidence_level,
            )
            for k, v in hm.items():
                metrics[f"{h}/{k}"] = v

        if cfg.is_ref_device and save_predictions:
            art = self.output_dir / split
            art.mkdir(parents=True, exist_ok=True)
            pd.DataFrame(rows).to_csv(
                art / f"predictions_epoch_{epoch}.csv", index=False
            )
            with open(art / f"metrics_epoch_{epoch}.json", "w") as f:
                json.dump(metrics, f, default=float, indent=2)
        return metrics

    # ------------------------------------------------------------------ #

    def inference(self, split: Optional[str] = None) -> pd.DataFrame:
        """Predictions + study-embedding capture (reference :753-826)."""
        cfg = self.config
        split = split or cfg.run_mode
        loader = self.loaders.get(split) or next(
            l for l in self.loaders.values() if l is not None
        )
        heads = list(cfg.head_structure)
        all_rows = []
        embeddings = []
        study_ids = []

        def capture_fn(params, batch):
            (emb,), kw = self._mil_inputs(params, batch)
            return self.bundle.mil_model.apply(
                {"params": params["mil"]}, emb, deterministic=True,
                mutable=["intermediates"], **kw,
            )

        capture = jax.jit(capture_fn)
        for batch in loader:
            n_real = len(batch["study_ids"])
            db = self.bundle.batch_sharding_fn(self._device_part(batch))
            outputs, inter = capture(self.state.params, db)
            emb = np.asarray(
                inter["intermediates"]["pooled"][0], np.float32
            )[:n_real]
            embeddings.append(emb)
            study_ids.extend(batch["study_ids"])
            for i in range(n_real):
                row = {"study_id": batch["study_ids"][i]}
                for h in heads:
                    row[h] = float(np.asarray(outputs[h])[i].reshape(-1)[0])
                all_rows.append(row)

        df = pd.DataFrame(all_rows)
        if cfg.is_ref_device:
            out = self.output_dir / "inference"
            out.mkdir(parents=True, exist_ok=True)
            df.to_csv(out / "predictions.csv", index=False)
            if cfg.save_embeddings and embeddings:
                name = (getattr(cfg, "embedding_output_file", None)
                        or "study_embeddings.npz")
                np.savez(
                    out / name,
                    embeddings=np.concatenate(embeddings),
                    study_ids=np.asarray(study_ids),
                )
        return df

    def _mil_inputs(self, params, batch):
        from deepcoro_clip_tpu.ops import pixels

        videos = pixels.normalize_videos(
            batch["videos"], *pixels.config_stats(self.config)
        )
        emb = self.bundle.video_model.apply(
            {"params": params["video_encoder"]}, videos,
            deterministic=True,
        )
        cfg = self.config
        if cfg.hierarchical_tokens:
            B, N = batch["videos"].shape[:2]
            emb = emb.reshape(B, N, emb.shape[1] // N, emb.shape[-1])
        return (emb,), {"mask": batch.get("video_mask"),
                        "view_ids": batch.get("view_ids")}

    def maybe_resume(self) -> int:
        if self.config.resume_training and self.ckpt.latest_exists():
            self.state = self.ckpt.restore(self.state, "checkpoint")
            meta = self.ckpt.load_meta("checkpoint") or {}
            # restore the BEST-so-far, not the latest epoch's val_loss —
            # else resume clobbers/prunes the true best checkpoint. The
            # `is not None` form also keeps a legitimate 0.0 from becoming
            # inf (old code: `meta.get("val_loss") or math.inf`).
            bvl = meta.get("best_val_loss", meta.get("val_loss"))
            self.best_val_loss = float(bvl) if bvl is not None else math.inf
            self.best_epoch = int(meta.get("best_epoch", -1))
            return int(meta.get("epoch", -1)) + 1
        return 0
