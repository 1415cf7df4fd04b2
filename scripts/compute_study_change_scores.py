"""Pre/post-intervention study change scores from embeddings.

Reference counterpart: scripts/compute_study_change_scores.py (490 LoC) +
extract_pci_embeddings.py — for paired studies (e.g. pre/post PCI), compute
embedding-space change scores (cosine distance, L2) and summarize per group.

Input: an .npz from scripts/generate_embeddings.py (--videos) or a probing
run's study_embeddings.npz, plus a pairing CSV with columns
``study_id_pre``, ``study_id_post`` (and optional group columns).

Usage:
    python scripts/compute_study_change_scores.py \
        --embeddings study_embeddings.npz --pairs pairs.csv --out scores.csv
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True)
    ap.add_argument("--pairs", required=True)
    ap.add_argument("--id_key", default="study_ids")
    ap.add_argument("--emb_key", default="embeddings")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    data = np.load(args.embeddings, allow_pickle=True)
    ids = [str(s) for s in data[args.id_key]]
    emb = np.asarray(data[args.emb_key], np.float32)
    index = {s: i for i, s in enumerate(ids)}

    pairs = pd.read_csv(args.pairs)
    rows = []
    for _, row in pairs.iterrows():
        a, b = str(row["study_id_pre"]), str(row["study_id_post"])
        if a not in index or b not in index:
            continue
        ea, eb = emb[index[a]], emb[index[b]]
        na = ea / max(np.linalg.norm(ea), 1e-8)
        nb = eb / max(np.linalg.norm(eb), 1e-8)
        out_row = dict(row)
        out_row["cosine_change"] = float(1.0 - na @ nb)
        out_row["l2_change"] = float(np.linalg.norm(ea - eb))
        rows.append(out_row)
    df = pd.DataFrame(rows)
    df.to_csv(args.out, index=False)
    print(f"{len(df)} pairs scored; mean cosine change "
          f"{df['cosine_change'].mean():.4f} -> {args.out}")


if __name__ == "__main__":
    main()
