"""Collation into fixed-shape device-ready numpy batches.

Mirrors the reference collate functions (reference:
dataloaders/video_clip_dataset.py:843-969 and video_dataset.py:426-505), with
one TPU-specific rule: EVERY array in a batch has a static shape — padded
slots are explicit masks (``video_mask``, ``text_valid``, ``sample_mask``)
instead of the reference's variable-size gathers (SURVEY.md §7).
"""

from __future__ import annotations

import warnings

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def pick_text_bucket(
    texts: List[str], tokenizer, max_text_length: int,
    buckets: Optional[List[int]] = None,
) -> int:
    """Smallest configured bucket that fits the batch's longest report (+2
    special tokens). Static per-bucket shapes: XLA compiles one step per
    bucket, then every batch reuses a cached program."""
    if not buckets:
        return max_text_length
    if hasattr(tokenizer, "tokenize_ids"):
        # body tokens only: add CLS+SEP
        need = max((len(tokenizer.tokenize_ids(t)) for t in texts), default=0) + 2
    else:  # HF tokenizer: one batch call; ids already include specials
        ids = tokenizer(list(texts), truncation=True, padding=False)["input_ids"]
        need = max((len(x) for x in ids), default=0)
    for b in sorted(buckets):
        if b >= need:
            return min(b, max_text_length)
    return max_text_length


def wire_patch(cfg) -> Optional[tuple]:
    """Patch dims for ``collate_*(..., patch=)`` when the config enables the
    patch-major wire (config.patch_wire, uint8 wire only), else None."""
    if not getattr(cfg, "patch_wire", False):
        return None
    if getattr(cfg, "wire_dtype", "uint8") != "uint8":
        return None
    from deepcoro_clip_tpu.models.video_encoder import resolve_architecture

    return tuple(resolve_architecture(cfg)["vit_patch"])


def _maybe_patchify(videos: np.ndarray,
                    patch: Optional[Sequence[int]]) -> np.ndarray:
    """Patch-major wire (config.patch_wire): host space-to-depth so the
    device patchify is a pure matmul (data/patch_wire.py). uint8-only; a
    float wire silently keeps the spatial layout (stats are host-applied
    there, so the device copy it removes does not exist)."""
    if patch is None or videos.dtype != np.uint8:
        return videos
    from deepcoro_clip_tpu.data.patch_wire import patchify_videos

    return patchify_videos(videos, tuple(patch))


def collate_clip(
    items: List[Dict[str, Any]],
    tokenizer,
    max_text_length: int = 512,
    length_buckets: Optional[List[int]] = None,
    patch: Optional[Sequence[int]] = None,
) -> Dict[str, np.ndarray]:
    """Plain CLIP mode: stacked videos + tokenized per-sample report
    (reference :946-969)."""
    videos = _maybe_patchify(np.stack([it["videos"] for it in items]), patch)
    mask = np.stack([it["video_mask"] for it in items])
    texts = [it["text"] for it in items]
    enc = tokenizer(
        texts,
        max_length=pick_text_bucket(texts, tokenizer, max_text_length,
                                    length_buckets),
        padding="max_length",
        truncation=True,
        return_tensors="np",
    )
    return {
        "videos": videos,
        "video_mask": mask,
        "input_ids": np.asarray(enc["input_ids"], np.int32),
        "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        "texts": texts,
        "paths": [it["paths"] for it in items],
        "study_ids": [it.get("study_id", "") for it in items],
    }


def collate_multi_positive(
    items: List[Dict[str, Any]],
    tokenizer,
    max_text_length: int = 512,
    max_texts: int = 64,
    patch: Optional[Sequence[int]] = None,
) -> Dict[str, np.ndarray]:
    """SigLIP multi-positive mode (reference :843-944): dedup text ids across
    the batch into a unique-text bank [M<=max_texts], build ``positive_mask``
    [B, M] and ``positive_weights`` [B, M]. The bank is PADDED to exactly
    ``max_texts`` (text_valid marks real slots) so XLA sees one shape.

    Items must carry ``positives``: list of (text, weight).
    """
    B = len(items)
    text_to_idx: Dict[str, int] = {}
    bank: List[str] = []
    pos = np.zeros((B, max_texts), np.float32)
    w = np.ones((B, max_texts), np.float32)
    dropped = 0
    for i, it in enumerate(items):
        for text, weight in it.get("positives", []):
            j = text_to_idx.get(text)
            if j is None:
                if len(bank) >= max_texts:
                    dropped += 1
                    continue
                j = len(bank)
                text_to_idx[text] = j
                bank.append(text)
            pos[i, j] = 1.0
            w[i, j] = np.float32(weight)
        for text, weight in it.get("negatives", []):
            j = text_to_idx.get(text)
            if j is None:
                if len(bank) >= max_texts:
                    dropped += 1
                    continue
                j = len(bank)
                text_to_idx[text] = j
                bank.append(text)
            # negative: pos stays 0; weight applies to the negative term
            w[i, j] = np.float32(weight)

    M = len(bank)
    texts_padded = bank + [""] * (max_texts - M)
    enc = tokenizer(
        texts_padded,
        max_length=max_text_length,
        padding="max_length",
        truncation=True,
        return_tensors="np",
    )
    valid = np.zeros((max_texts,), np.float32)
    valid[:M] = 1.0

    out = {
        "videos": _maybe_patchify(
            np.stack([it["videos"] for it in items]), patch),
        "video_mask": np.stack([it["video_mask"] for it in items]),
        "input_ids": np.asarray(enc["input_ids"], np.int32),
        "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        "positive_mask": pos,
        "positive_weights": w,
        "text_valid": valid,
        "unique_texts": bank,
        "paths": [it.get("paths", []) for it in items],
        "n_dropped_texts": dropped,
    }
    return out


def collate_single_head(
    items: List[Dict[str, Any]],
    tokenizer,
    sampler,
    text_by_id: Dict[str, str],
    video_to_positives: Dict[str, List],
    epoch: int = 0,
    phase: str = "train",
    max_text_length: int = 512,
    max_texts: int = 64,
    patch: Optional[Sequence[int]] = None,
) -> Dict[str, np.ndarray]:
    """Batch assembly through the SingleHeadRetrievalSampler
    (data/single_head_sampler.py): the sampler builds the batch's deduped
    text bank plus dense (Y, W) matrices; this pads them to ``max_texts``
    for XLA shape stability. Emits the same keys as
    ``collate_multi_positive`` so the loader/runner plumbing is identical —
    pair with ``loss_name: siglip_single_head``, whose W semantics differ
    (W weights every SAMPLED pair; 0 excludes).

    The sampler carries round-robin coverage state across calls: share ONE
    instance per run (thread-backend loaders share it; a process-backend
    loader would fork the state and degrade coverage back to per-worker)."""
    from deepcoro_clip_tpu.data.single_head_sampler import VideoEntry

    entries = [
        VideoEntry(
            video_id=str(it["video_id"]),
            positive_pairs=video_to_positives.get(str(it["video_id"]), []),
        )
        for it in items
    ]
    out_s = sampler.prepare_batch(entries, epoch=epoch, phase=phase)
    B = len(items)
    n_bank = len(out_s.text_ids)
    order = np.arange(n_bank)
    if n_bank > max_texts:
        # On overflow keep every POSITIVE column and truncate negatives
        # only (insertion order would drop later videos' positives before
        # earlier videos' negatives, leaving all-zero label rows that
        # contribute a degenerate loss term). Order is preserved within
        # each group; stable sort on the is-negative key.
        is_pos = np.asarray(out_s.labels).max(axis=0) > 0
        order = np.argsort(~is_pos, kind="stable")
        if int(is_pos.sum()) > max_texts:
            warnings.warn(
                f"collate_single_head: {int(is_pos.sum())} positive texts "
                f"exceed max_texts={max_texts}; some rows lose positives — "
                "raise max_texts or lower the sampler's positive budget.")
    M = min(n_bank, max_texts)
    dropped = n_bank - M
    sel = order[:M]
    pos = np.zeros((B, max_texts), np.float32)
    w = np.zeros((B, max_texts), np.float32)
    pos[:, :M] = np.asarray(out_s.labels)[:, sel]
    w[:, :M] = np.asarray(out_s.weights)[:, sel]
    bank = [text_by_id[out_s.text_ids[j]] for j in sel]
    texts_padded = bank + [""] * (max_texts - M)
    enc = tokenizer(
        texts_padded,
        max_length=max_text_length,
        padding="max_length",
        truncation=True,
        return_tensors="np",
    )
    valid = np.zeros((max_texts,), np.float32)
    valid[:M] = 1.0
    return {
        "videos": _maybe_patchify(
            np.stack([it["videos"] for it in items]), patch),
        "video_mask": np.stack([it["video_mask"] for it in items]),
        "input_ids": np.asarray(enc["input_ids"], np.int32),
        "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        "positive_mask": pos,
        "positive_weights": w,
        "text_valid": valid,
        "unique_texts": bank,
        "paths": [it.get("paths", []) for it in items],
        "n_dropped_texts": dropped,
    }


def collate_mil(
    items: List[Dict[str, Any]],
    head_names: Sequence[str],
    patch: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """MIL/probing mode (reference video_dataset custom_collate_fn:426-505):
    targets dict per head + optional view_ids."""
    out: Dict[str, Any] = {
        "videos": _maybe_patchify(
            np.stack([it["videos"] for it in items]), patch),
        "video_mask": np.stack([it["video_mask"] for it in items]),
        "targets": {
            h: np.stack([np.asarray(it["targets"][h]) for it in items])
            for h in head_names
        },
        "study_ids": [it.get("study_id", "") for it in items],
        "paths": [it["paths"] for it in items],
    }
    if "view_ids" in items[0]:
        out["view_ids"] = np.stack([it["view_ids"] for it in items])
    return out
