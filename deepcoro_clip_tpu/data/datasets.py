"""Datasets: CSV-manifest video(-text) sampling with single- and multi-video
(study) modes.

Behavioral spec from the reference ``VideoClipDataset``
(reference: dataloaders/video_clip_dataset.py:25-841):
- single-video: one row per clip; rows filtered by Split + file existence
  (:384-518);
- multi-video: rows grouped by ``groupby_column`` (StudyInstanceUID) with one
  report per study (:343-377); per-study videos sampled/truncated to
  ``num_videos`` and zero-padded with an explicit mask (:597-646) — the
  reference pads silently, we keep the mask first-class for fixed-shape TPU
  batches;
- failed loads become zero clips with a warning (:629-635).

and ``VideoDataset`` (MIL/probing; reference: dataloaders/video_dataset.py:23-571):
label targets per head, optional per-video view column, labels_map application.

Pure host-side numpy; no torch DataLoader. Parallel prefetch lives in
``data/loader.py``.
"""

from __future__ import annotations

import logging
import warnings
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from deepcoro_clip_tpu.data.csv_utils import read_csv_with_fallback
from deepcoro_clip_tpu.data.video_io import load_video

log = logging.getLogger(__name__)


class VideoClipDataset:
    """Video(+text) dataset over a CSV manifest."""

    def __init__(
        self,
        data_filename: str,
        root: str = ".",
        split: Optional[str] = "train",
        split_column: str = "Split",
        datapoint_loc_label: str = "FileName",
        target_label: Optional[str] = "Report",
        multi_video: bool = False,
        num_videos: int = 1,
        groupby_column: str = "StudyInstanceUID",
        shuffle_videos: bool = True,
        frames: int = 16,
        stride: int = 1,
        resize: int = 224,
        mean: Optional[Sequence[float]] = None,
        std: Optional[Sequence[float]] = None,
        rand_augment: bool = False,
        seed: int = 42,
        check_files: bool = True,
        extra_columns: Sequence[str] = (),
        wire_dtype: str = "float32",
        mono_wire: bool = False,
    ):
        self.root = Path(root)
        self.path_col = datapoint_loc_label
        self.target_label = target_label
        self.multi_video = multi_video
        self.num_videos = num_videos
        self.groupby_column = groupby_column
        self.shuffle_videos = shuffle_videos
        self.frames = frames
        self.stride = stride
        self.resize = resize
        self.mean = list(mean) if mean is not None else None
        self.std = list(std) if std is not None else None
        self.rand_augment = rand_augment and (split == "train")
        self.training = split == "train"
        # "uint8": raw pixels on the wire, normalized on-device (ops/pixels)
        self.wire_dtype = wire_dtype
        # grayscale wire: channel 0 only, replication folded on-device
        # (models/layers._PatchProj); 1/3 the host work and H2D bytes
        self.mono_wire = mono_wire
        self.channels = 1 if mono_wire else 3
        self.extra_columns = list(extra_columns)
        self._seed = seed

        df = read_csv_with_fallback(data_filename)
        if split_column in df.columns and split is not None and split != "all":
            mask = df[split_column].astype(str).str.lower() == str(split).lower()
            df = df[mask]
        df = df.copy()
        df["__path"] = df[self.path_col].astype(str).map(
            lambda p: str(p) if Path(p).is_absolute() else str(self.root / p)
        )
        if check_files:
            exists = df["__path"].map(lambda p: Path(p).exists())
            missing = int((~exists).sum())
            if missing:
                log.warning("dropping %d rows with missing files", missing)
            df = df[exists]
        self.df = df.reset_index(drop=True)

        self.epoch = 0
        if multi_video:
            self._init_multi_video()
        else:
            self.samples = [
                {
                    "paths": [row["__path"]],
                    "text": self._clean_text(
                        row.get(target_label) if target_label else ""
                    ),
                    "row_indices": [i],
                }
                for i, row in self.df.iterrows()
            ]

    @staticmethod
    def _clean_text(value) -> str:
        """Missing/NaN report cells become '' (the HF tokenizer rejects
        non-str inputs)."""
        return value if isinstance(value, str) else ""

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _item_rng(self, i: int) -> np.random.Generator:
        """Per-item, per-epoch generator: deterministic AND thread-safe (the
        prefetch loader calls __getitem__ from multiple threads; a shared
        Generator would race)."""
        if not self.training:
            return np.random.default_rng((42, i))
        return np.random.default_rng((self._seed, self.epoch, i))

    def _init_multi_video(self):
        """Group clips into studies, one report per study
        (reference :343-377)."""
        self.samples = []
        for sid, group in self.df.groupby(self.groupby_column, sort=True):
            text = ""
            if self.target_label and self.target_label in group.columns:
                texts = group[self.target_label].dropna()
                text = str(texts.iloc[0]) if len(texts) else ""
            self.samples.append(
                {
                    "paths": group["__path"].tolist(),
                    "text": text,
                    "study_id": sid,
                    "row_indices": group.index.tolist(),
                }
            )

    def __len__(self) -> int:
        return len(self.samples)

    def _load_one(self, path: str, rng) -> np.ndarray:
        try:
            return load_video(
                path,
                n_frames=self.frames,
                resize=self.resize,
                stride=self.stride,
                mean=self.mean,
                std=self.std,
                rand_augment=self.rand_augment,
                rng=rng if self.training else None,
                output_dtype=self.wire_dtype,
                mono=self.mono_wire,
            )
        except Exception as e:
            # corrupt/missing video -> zero clip (reference :629-635)
            log.warning("failed to load %s: %s", path, e)
            return np.zeros((self.frames, self.resize, self.resize,
                             self.channels), np.dtype(self.wire_dtype))

    def _select_clips(self, sample, rng) -> list[int]:
        """Indices into sample['paths']/'row_indices' for the clips used this
        epoch (permutation happens on INDICES so per-clip metadata like view
        ids stays aligned with the loaded videos)."""
        n_avail = len(sample["paths"])
        N = self.num_videos if self.multi_video else 1
        sel = list(range(n_avail))
        if self.multi_video and n_avail > N:
            if self.shuffle_videos and self.training:
                sel = list(rng.permutation(n_avail)[:N])
            else:
                sel = sel[:N]
        return sel[:N]

    def __getitem__(self, i: int) -> Dict[str, Any]:
        sample = self.samples[i]
        rng = self._item_rng(i)
        N = self.num_videos if self.multi_video else 1
        sel = self._select_clips(sample, rng)
        paths = [sample["paths"][j] for j in sel]
        videos = np.zeros((N, self.frames, self.resize, self.resize,
                           self.channels), np.dtype(self.wire_dtype))
        mask = np.zeros((N,), bool)
        for j, p in enumerate(paths):
            videos[j] = self._load_one(p, rng)
            mask[j] = True
        out = {
            "videos": videos,
            "video_mask": mask,
            "text": sample["text"],
            "paths": paths + [""] * (N - len(paths)),
            "study_id": sample.get("study_id", paths[0] if paths else ""),
            "selected_rows": [sample["row_indices"][j] for j in sel],
        }
        for c in self.extra_columns:
            first = self.df.loc[sample["row_indices"][0]]
            out[c] = first.get(c, None)
        return out


class VideoDataset(VideoClipDataset):
    """Label-targeted variant for linear probing / MIL
    (reference: dataloaders/video_dataset.py:23-571)."""

    def __init__(
        self,
        *args,
        target_labels: Sequence[str] = (),
        labels_map: Optional[Dict[str, Dict[str, int]]] = None,
        view_column: Optional[str] = None,
        num_view_classes: int = 0,
        view_labels_map: Optional[Dict[str, int]] = None,
        **kwargs,
    ):
        super().__init__(*args, target_label=None, extra_columns=(), **kwargs)
        self.target_labels = list(target_labels)
        self.labels_map = labels_map or {}
        self.view_column = view_column
        # view NAME -> class id (reference view_aware configs); numeric view
        # columns pass through unchanged
        self.view_labels_map = view_labels_map or {}
        # PAD view id = num_view_classes (reference PAD embedding row,
        # models/multi_instance_linear_probing.py:141-145)
        self.pad_view_id = num_view_classes

    def __getitem__(self, i: int) -> Dict[str, Any]:
        out = super().__getitem__(i)
        sample = self.samples[i]
        first = self.df.loc[sample["row_indices"][0]]
        targets: Dict[str, np.ndarray] = {}
        for col in self.target_labels:
            v = first.get(col, np.nan)
            if col in self.labels_map and isinstance(v, str):
                v = self.labels_map[col].get(v, -1)
            targets[col] = np.float32(np.nan_to_num(np.float32(v)))
        out["targets"] = targets

        if self.view_column:
            N = self.num_videos
            view_ids = np.full((N,), self.pad_view_id, np.int32)
            # per-clip metadata follows the SELECTED clip order so view ids
            # stay aligned with the loaded (possibly shuffled) videos
            sel_rows = self.df.loc[out["selected_rows"]]
            for j, v in enumerate(sel_rows[self.view_column].tolist()[:N]):
                if isinstance(v, str) and v in self.view_labels_map:
                    view_ids[j] = int(self.view_labels_map[v])
                    continue
                try:
                    view_ids[j] = int(v)
                except (TypeError, ValueError):
                    view_ids[j] = self.pad_view_id
            out["view_ids"] = view_ids
        return out


class StatsDataset:
    """Subsample clips for mean/std estimation (reference:
    dataloaders/stats_dataset.py; squared-frame subsample, max_samples=128)."""

    def __init__(self, dataset: VideoClipDataset, max_samples: int = 128):
        self.dataset = dataset
        n = min(len(dataset), max_samples)
        self.indices = np.linspace(0, len(dataset) - 1, n).astype(int) if n else []

    def compute(self) -> tuple[np.ndarray, np.ndarray]:
        """Returns per-channel (mean, std) over raw (unnormalized) pixels
        (one channel on the mono wire — channel-uniform by that wire's
        grayscale contract; consumers broadcast, see models/layers)."""
        C = getattr(self.dataset, "channels", 3)
        s = np.zeros(C, np.float64)
        ss = np.zeros(C, np.float64)
        count = 0
        saved_mean, saved_std = self.dataset.mean, self.dataset.std
        saved_aug = self.dataset.rand_augment
        self.dataset.mean = self.dataset.std = None
        self.dataset.rand_augment = False
        try:
            for i in self.indices:
                item = self.dataset[int(i)]
                v = item["videos"][item["video_mask"]]
                flat = v.reshape(-1, C).astype(np.float64)
                s += flat.sum(axis=0)
                ss += (flat**2).sum(axis=0)
                count += flat.shape[0]
        finally:
            self.dataset.mean, self.dataset.std = saved_mean, saved_std
            self.dataset.rand_augment = saved_aug
        count = max(count, 1)
        mean = s / count
        std = np.sqrt(np.maximum(ss / count - mean**2, 1e-12))
        return mean.astype(np.float32), std.astype(np.float32)


class SimpleTextDataset:
    """Tokenize-only dataset for bulk text encoding
    (reference: dataloaders/simple_text_dataset.py:4-25)."""

    def __init__(self, texts: Sequence[str]):
        self.texts = list(texts)

    def __len__(self):
        return len(self.texts)

    def __getitem__(self, i):
        return self.texts[i]
