"""Streaming (blocked) retrieval evaluation for large galleries.

Reference counterpart: utils/retrieval_metrics_streaming.py:11-105 (chunked
Recall@k for large N). TPU-native version: the similarity matrix is never
materialised — video embeddings stream through a jitted device matmul against
the (resident) text bank in fixed-size blocks, keeping only per-video rank
statistics. Handles the 200k-video epoch-end evaluation that the reference
runs as rank-0 python loops (SURVEY.md §3.5 hot loop 4).
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _rank_stats_block(v_block, t_bank, gt_ids):
    """For each video in the block: rank of its GT text + top-1 hit.

    v_block: [b, D] (normalized); t_bank: [M, D] (normalized);
    gt_ids: [b] int32 index into the bank.
    Returns ranks [b] (1-based).
    """
    sim = v_block @ t_bank.T  # [b, M]
    gt_score = jnp.take_along_axis(sim, gt_ids[:, None], axis=1)
    # rank = 1 + number of texts scoring strictly higher than the GT text
    higher = jnp.sum((sim > gt_score).astype(jnp.int32), axis=1)
    return higher + 1


def streaming_retrieval_metrics(
    video_embeddings: Iterable[np.ndarray] | np.ndarray,
    text_bank: np.ndarray,
    gt_text_ids: Sequence[int],
    recall_k: Sequence[int] = (1, 5, 10, 50),
    block_size: int = 1024,
) -> Dict[str, float]:
    """Recall@k / MRR / MedianRank over a streamed video set."""
    tb = np.asarray(text_bank, np.float32)
    tb = tb / np.maximum(np.linalg.norm(tb, axis=1, keepdims=True), 1e-8)
    tb_dev = jnp.asarray(tb)

    if isinstance(video_embeddings, np.ndarray):
        video_embeddings = [video_embeddings]
    gt = np.asarray(gt_text_ids, np.int32)
    ranks = []
    off = 0
    for chunk in video_embeddings:
        chunk = np.asarray(chunk, np.float32)
        chunk = chunk / np.maximum(
            np.linalg.norm(chunk, axis=1, keepdims=True), 1e-8
        )
        for i in range(0, len(chunk), block_size):
            blk = chunk[i : i + block_size]
            ids = gt[off : off + len(blk)]
            pad = block_size - len(blk)
            if pad:
                blk = np.concatenate([blk, np.zeros((pad, blk.shape[1]), np.float32)])
                ids = np.concatenate([ids, np.zeros(pad, np.int32)])
            r = np.asarray(
                _rank_stats_block(jnp.asarray(blk), tb_dev, jnp.asarray(ids))
            )
            ranks.append(r[: block_size - pad] if pad else r)
            off += len(r) - pad if pad else len(r)
    ranks = np.concatenate(ranks)
    out = {f"Recall@{k}": float(np.mean(ranks <= k)) for k in recall_k
           if k <= tb.shape[0]}
    out["MRR"] = float(np.mean(1.0 / ranks))
    out["MedianRank"] = float(np.median(ranks))
    return out
