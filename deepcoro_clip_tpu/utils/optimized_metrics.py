"""Memory-bounded retrieval-metric computer with sanity checks.

Reference counterpart: utils/optimized_metrics.py:11-214
(OptimizedMetricsComputer — chunked video x text top-k with pinned unique-
text features, no-gradient asserts, periodic cache clearing). TPU-native
version: the text bank is deduped once and kept DEVICE-resident; video
chunks stream through the jitted block kernel from
``retrieval_metrics_streaming`` so the full [N_videos, N_texts] similarity
matrix never materialises. The CUDA-specific machinery (pin_memory,
``torch.cuda.empty_cache``) has no TPU analogue and is deliberately absent —
XLA owns device memory; bounding live buffers is done by chunking alone.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def validate_concrete(*arrays) -> None:
    """Sanity check mirroring the reference's ``validate_no_gradients``
    (utils/optimized_metrics.py:203): metric inputs must be CONCRETE values,
    not jax tracers — a tracer here means the metric path was accidentally
    captured inside a jitted/grad computation."""
    for a in arrays:
        if a is None:
            continue
        if isinstance(a, jax.core.Tracer):
            raise AssertionError(
                "metric inputs must be concrete (np.ndarray / jax.Array), "
                f"got tracer {type(a).__name__} — do not call metrics "
                "inside jit/grad"
            )


class OptimizedMetricsComputer:
    """Chunked retrieval metrics over a pinned (device-resident) text bank.

    Usage mirrors the reference:
        omc = OptimizedMetricsComputer(video_chunk_size=2048)
        uniq, text_to_idx, gt = omc.prepare_text_features(text_feats, texts)
        metrics = omc.compute_metrics_streaming(video_feats, k_values=[1,5])
    """

    def __init__(
        self,
        video_chunk_size: int = 2048,
        text_chunk_size: int = 4096,  # accepted for API parity; the bank is
        pin_text_features: bool = True,  # device-resident, so text chunking
        clear_cache_frequency: int = 10,  # and cache clearing are no-ops
    ) -> None:
        self.video_chunk_size = int(video_chunk_size)
        self.text_chunk_size = int(text_chunk_size)
        self.pin_text_features = bool(pin_text_features)
        self.clear_cache_frequency = int(clear_cache_frequency)
        self._bank: Optional[jax.Array] = None
        self._bank_np: Optional[np.ndarray] = None
        self._gt: Optional[np.ndarray] = None

    # -------------------------------------------------------------- #

    def prepare_text_features(
        self, text_features: np.ndarray, texts: Sequence[str]
    ) -> Tuple[np.ndarray, Dict[str, int], np.ndarray]:
        """Dedup per-sample texts into a unique bank (first occurrence wins,
        reference :50-66) and pin the normalized bank on device. Returns
        (unique_text_features, text_to_idx, ground_truth_indices)."""
        text_features = np.asarray(text_features, np.float32)
        validate_concrete(text_features)
        if len(text_features) != len(texts):
            raise ValueError(
                f"{len(text_features)} feature rows vs {len(texts)} texts")
        unique_texts = list(dict.fromkeys(texts))
        text_to_idx = {t: i for i, t in enumerate(unique_texts)}
        first_row = {}
        for i, t in enumerate(texts):
            first_row.setdefault(t, i)
        uniq = np.stack([text_features[first_row[t]] for t in unique_texts])
        uniq = uniq / np.maximum(
            np.linalg.norm(uniq, axis=1, keepdims=True), 1e-8)
        gt = np.asarray([text_to_idx[t] for t in texts], np.int32)
        self._bank_np = uniq
        self._bank = jnp.asarray(uniq) if self.pin_text_features else None
        self._gt = gt
        return uniq, text_to_idx, gt

    def compute_metrics_streaming(
        self,
        video_features: np.ndarray,
        text_features: Optional[np.ndarray] = None,
        ground_truth_indices: Optional[np.ndarray] = None,
        k_values: List[int] = [1, 5, 10, 50],
    ) -> Dict[str, float]:
        """Recall@k (percent, reference :188), MRR_V2T, alignment score and
        embedding norms, computed in ``video_chunk_size`` blocks against the
        pinned bank."""
        from deepcoro_clip_tpu.utils.retrieval_metrics_streaming import (
            streaming_retrieval_metrics,
        )

        video_features = np.asarray(video_features, np.float32)
        validate_concrete(video_features, text_features, ground_truth_indices)
        if text_features is not None:
            bank = np.asarray(text_features, np.float32)
            bank = bank / np.maximum(
                np.linalg.norm(bank, axis=1, keepdims=True), 1e-8)
        elif self._bank_np is not None:
            bank = self._bank_np
        else:
            raise ValueError("no text features: pass them or call "
                             "prepare_text_features first")
        gt = (np.asarray(ground_truth_indices, np.int32)
              if ground_truth_indices is not None else self._gt)
        if gt is None:
            raise ValueError("no ground-truth indices available")

        v = video_features / np.maximum(
            np.linalg.norm(video_features, axis=1, keepdims=True), 1e-8)
        base = streaming_retrieval_metrics(
            v, bank, gt, recall_k=tuple(k_values),
            block_size=self.video_chunk_size,
        )
        out = {f"Recall@{k}": 100.0 * base[f"Recall@{k}"] for k in k_values}
        out["MRR_V2T"] = base["MRR"]
        # alignment: cosine to the GT text (reference :174-177)
        out["alignment_score"] = float(np.mean(np.sum(v * bank[gt], axis=1)))
        out["video_norm"] = float(
            np.linalg.norm(video_features, axis=1).mean())
        out["text_norm"] = float(np.linalg.norm(
            (text_features if text_features is not None else bank),
            axis=1).mean())
        return out

    def clear_pinned_features(self) -> None:
        self._bank = None
        self._bank_np = None
        self._gt = None
