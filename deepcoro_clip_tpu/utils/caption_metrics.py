"""Captioning metrics: BLEU-n and ROUGE-L (host-side, dependency-free).

The reference uses nltk/rouge_score (reference:
runners/multitask_runner.py:1356-1503, _compute_captioning_metrics); this
image has neither, so the standard formulas are implemented directly:
corpus BLEU with uniform n-gram weights + brevity penalty, and ROUGE-L F1
from longest-common-subsequence.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(
    candidates: List[str], references: List[str], max_n: int = 4
) -> Dict[str, float]:
    """Corpus-level BLEU-1..max_n (uniform weights, standard brevity penalty)."""
    clipped = [0] * max_n
    totals = [0] * max_n
    cand_len = 0
    ref_len = 0
    for cand, ref in zip(candidates, references):
        c = str(cand).lower().split()
        r = str(ref).lower().split()
        cand_len += len(c)
        ref_len += len(r)
        for n in range(1, max_n + 1):
            cg = _ngrams(c, n)
            rg = _ngrams(r, n)
            clipped[n - 1] += sum(min(v, rg[g]) for g, v in cg.items())
            totals[n - 1] += max(sum(cg.values()), 0)
    precisions = [
        clipped[i] / totals[i] if totals[i] else 0.0 for i in range(max_n)
    ]
    bp = 1.0 if cand_len > ref_len else math.exp(1 - ref_len / max(cand_len, 1))
    out = {}
    for n in range(1, max_n + 1):
        ps = precisions[:n]
        if min(ps) > 0:
            geo = math.exp(sum(math.log(p) for p in ps) / n)
        else:
            geo = 0.0
        out[f"bleu{n}"] = bp * geo
    return out


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l(candidates: List[str], references: List[str]) -> float:
    """Mean sentence-level ROUGE-L F1."""
    f1s = []
    for cand, ref in zip(candidates, references):
        c = str(cand).lower().split()
        r = str(ref).lower().split()
        lcs = _lcs_len(c, r)
        if lcs == 0:
            f1s.append(0.0)
            continue
        p = lcs / len(c)
        rec = lcs / len(r)
        f1s.append(2 * p * rec / (p + rec))
    return float(sum(f1s) / max(len(f1s), 1))


def captioning_metrics(candidates: List[str], references: List[str]) -> Dict[str, float]:
    out = corpus_bleu(candidates, references)
    out["rouge_l"] = rouge_l(candidates, references)
    return out
