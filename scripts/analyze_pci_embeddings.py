"""Pre/post-PCI embedding-shift analysis with bootstrap + permutation tests.

Reference counterpart: manuscript/analyses/{extract_and_compare_pci_embeddings,
analyze_pci_embeddings}.py — does the backbone's study embedding MOVE after a
percutaneous coronary intervention, and does it move MORE for studies where a
PCI was actually performed than for diagnostic re-angiographies?

Inputs are this repo's artifact formats (no torch .pt):
- --pre / --post: study_embeddings.npz files (keys ``embeddings`` [N, D],
  ``study_ids`` [N]) as written by `scripts/generate_embeddings.py` or the
  probing runner's inference capture;
- --status: CSV with columns ``StudyInstanceUID`` and ``pci_performed``
  (0/1), matching studies by the PRE-study id.

Outputs: per-study cosine shift CSV, group summary with bootstrap CIs
(n=1000), a permutation p-value for the group difference, and a histogram
panel. All statistics are plain numpy — this is offline analytics, not a
device path.

Usage:
  python scripts/analyze_pci_embeddings.py --pre pre.npz --post post.npz \
      --status pci_status.csv --out outputs/pci_analysis
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict

import numpy as np
import pandas as pd


def cosine_shift(pre: np.ndarray, post: np.ndarray) -> np.ndarray:
    """1 - cosine(pre_i, post_i) per study — 0 means the embedding did not
    move (the reference's primary endpoint)."""
    a = pre / np.maximum(np.linalg.norm(pre, axis=1, keepdims=True), 1e-8)
    b = post / np.maximum(np.linalg.norm(post, axis=1, keepdims=True), 1e-8)
    return 1.0 - np.sum(a * b, axis=1)


def bootstrap_mean_ci(x: np.ndarray, n_bootstrap: int = 1000,
                      confidence: float = 0.95, seed: int = 0):
    rng = np.random.default_rng(seed)
    means = np.array([
        rng.choice(x, size=len(x), replace=True).mean()
        for _ in range(n_bootstrap)
    ])
    alpha = (1 - confidence) / 2
    return float(x.mean()), float(np.quantile(means, alpha)), float(
        np.quantile(means, 1 - alpha))


def permutation_pvalue(a: np.ndarray, b: np.ndarray,
                       n_perm: int = 10000, seed: int = 0) -> float:
    """Two-sided permutation test on the mean difference (reference uses a
    t-test; a permutation test needs no normality at these group sizes)."""
    rng = np.random.default_rng(seed)
    obs = abs(a.mean() - b.mean())
    pooled = np.concatenate([a, b])
    n = len(a)
    hits = 0
    for _ in range(n_perm):
        rng.shuffle(pooled)
        if abs(pooled[:n].mean() - pooled[n:].mean()) >= obs:
            hits += 1
    return (hits + 1) / (n_perm + 1)


def analyze(pre_npz: str, post_npz: str, status_csv: str,
            out_dir: str | Path, n_bootstrap: int = 1000) -> Dict:
    pre = np.load(pre_npz, allow_pickle=True)
    post = np.load(post_npz, allow_pickle=True)
    pre_lookup = {str(s): e for s, e in zip(pre["study_ids"],
                                            pre["embeddings"])}
    post_lookup = {str(s): e for s, e in zip(post["study_ids"],
                                             post["embeddings"])}
    common = sorted(set(pre_lookup) & set(post_lookup))
    if not common:
        raise SystemExit("no common study ids between pre and post files")
    P = np.stack([pre_lookup[s] for s in common]).astype(np.float32)
    Q = np.stack([post_lookup[s] for s in common]).astype(np.float32)
    shift = cosine_shift(P, Q)

    status = pd.read_csv(status_csv)
    flag = status.set_index(
        status["StudyInstanceUID"].astype(str))["pci_performed"].to_dict()
    df = pd.DataFrame({
        "StudyInstanceUID": common,
        "cosine_shift": shift,
        "pci_performed": [int(flag.get(s, -1)) for s in common],
    })
    df = df[df.pci_performed >= 0]
    a = df[df.pci_performed == 1].cosine_shift.to_numpy()
    b = df[df.pci_performed == 0].cosine_shift.to_numpy()

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "pci_embedding_shift.csv", index=False)

    summary: Dict = {"n_pci": int(len(a)), "n_no_pci": int(len(b))}
    if len(a):
        m, lo, hi = bootstrap_mean_ci(a, n_bootstrap)
        summary["pci_shift"] = {"mean": m, "ci_lo": lo, "ci_hi": hi}
    if len(b):
        m, lo, hi = bootstrap_mean_ci(b, n_bootstrap)
        summary["no_pci_shift"] = {"mean": m, "ci_lo": lo, "ci_hi": hi}
    if len(a) >= 2 and len(b) >= 2:
        summary["mean_difference"] = float(a.mean() - b.mean())
        summary["permutation_p"] = permutation_pvalue(a, b)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        bins = np.linspace(0, max(float(shift.max()), 1e-3), 30)
        if len(a):
            ax.hist(a, bins=bins, alpha=0.6, label=f"PCI (n={len(a)})")
        if len(b):
            ax.hist(b, bins=bins, alpha=0.6, label=f"no PCI (n={len(b)})")
        ax.set_xlabel("1 - cosine(pre, post)")
        ax.set_ylabel("studies")
        ax.legend()
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(out_dir / "pci_shift_hist.png", dpi=120)
        plt.close(fig)
    except Exception as e:  # pragma: no cover
        print(f"plot skipped: {e}")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pre", required=True)
    ap.add_argument("--post", required=True)
    ap.add_argument("--status", required=True)
    ap.add_argument("--out", default="outputs/pci_analysis")
    ap.add_argument("--n_bootstrap", type=int, default=1000)
    args = ap.parse_args()
    summary = analyze(args.pre, args.post, args.status, args.out,
                      args.n_bootstrap)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
