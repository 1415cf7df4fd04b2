#!/usr/bin/env python
"""Inverse-prevalence weighting for SigLIP edges manifests.

Behavioral model: ``/root/reference/scripts/reweight_edges.py:19-67`` — each
edge gets a class-balanced "effective number of samples" weight
(Cui et al. 2019: w = (1-beta) / (1-beta^count)) computed over the
prevalence of its text's prompt type, with an optional percentile cap on
extreme weights. The weighted edges feed
``siglip_enable_severity_weighting``-style loss weighting through the
``weight``/``edge_weight`` column that `data/siglip.py` reads.

Usage:
    python scripts/reweight_edges.py edges.csv texts.csv edges_weighted.csv \
        [--beta 0.999] [--cap-percentile 99] [--prompt-type-column prompt_type]
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np
import pandas as pd


def effective_num_weight(count: int, beta: float = 0.999) -> float:
    """Class-balanced effective-number weight; count<=0 falls back to 1."""
    if count <= 0:
        return 1.0
    return (1.0 - beta) / (1.0 - beta ** count)


def reweight_edges(
    edges: pd.DataFrame,
    texts: pd.DataFrame,
    *,
    text_id_column: str = "text_id",
    prompt_type_column: str = "prompt_type",
    beta: float = 0.999,
    cap_percentile: float = 99.0,
) -> pd.DataFrame:
    """Return edges with a ``weight`` column by prompt-type prevalence."""
    cols = [text_id_column, prompt_type_column]
    have = [c for c in cols if c in texts.columns]
    if len(have) != 2:
        raise ValueError(f"texts manifest must contain {cols}, found {have}")

    lut = texts[cols].drop_duplicates()
    merged = edges.merge(lut, on=text_id_column, how="left")
    prompt = merged[prompt_type_column].fillna("unknown")

    counts = prompt.value_counts()
    weight_map: Dict[str, float] = {
        label: effective_num_weight(int(n), beta)
        for label, n in counts.items()
    }
    merged["weight"] = prompt.map(weight_map).astype(float)

    if cap_percentile and cap_percentile > 0:
        cap = float(np.percentile(merged["weight"], cap_percentile))
        merged["weight"] = merged["weight"].clip(upper=cap)
    return merged


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Reweight SigLIP edges by inverse prompt prevalence.")
    ap.add_argument("edges_csv")
    ap.add_argument("texts_csv")
    ap.add_argument("output_csv")
    ap.add_argument("--text-id-column", default="text_id")
    ap.add_argument("--prompt-type-column", default="prompt_type")
    ap.add_argument("--beta", type=float, default=0.999)
    ap.add_argument("--cap-percentile", type=float, default=99.0)
    args = ap.parse_args()

    out = reweight_edges(
        pd.read_csv(args.edges_csv),
        pd.read_csv(args.texts_csv),
        text_id_column=args.text_id_column,
        prompt_type_column=args.prompt_type_column,
        beta=args.beta,
        cap_percentile=args.cap_percentile,
    )
    out.to_csv(args.output_csv, index=False)
    print(f"wrote {len(out)} weighted edges to {args.output_csv}")


if __name__ == "__main__":
    main()
