"""Tree/segment-aware ("semantic") SigLIP retrieval metrics.

Reference counterpart: utils/semantic_metrics.py:69-232 — retrieval quality
judged not only by exact text match but by whether retrieved texts describe
the same coronary tree / segment / severity class as the ground truth.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def semantic_retrieval_metrics(
    sim: np.ndarray,                    # [N videos, M texts]
    gt_ids: Sequence[int],              # GT text index per video
    text_meta: List[Dict[str, Optional[str]]],  # per text: tree/segment/severity
    topk: int = 5,
) -> Dict[str, float]:
    """For each video's top-k retrieved texts, the fraction that match the GT
    text's tree / segment / severity."""
    gt_ids = np.asarray(gt_ids)
    order = np.argsort(-sim, axis=1)[:, :topk]
    hits = {"tree": [], "segment": [], "severity": []}
    for i, row in enumerate(order):
        gt = text_meta[gt_ids[i]]
        for key in hits:
            want = gt.get(key)
            if want is None:
                continue
            got = [text_meta[j].get(key) for j in row]
            hits[key].append(np.mean([g == want for g in got]))
    return {
        f"semantic_{k}_match@{topk}": float(np.mean(v)) if v else float("nan")
        for k, v in hits.items()
    }
