"""CSV manifest reading with separator fallback.

Reference: dataloaders/csv_utils.py:9-60 — the datasets ship with an "α"
(alpha) separator; fall back over (α, ',', tab, auto-sniff) and validate
expected columns.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import pandas as pd

SEPARATORS = ["α", ",", "\t", None]  # None = pandas sniffer


def read_csv_with_fallback(
    path: str | Path,
    expected_columns: Optional[Sequence[str]] = None,
) -> pd.DataFrame:
    last_err: Exception | None = None
    for sep in SEPARATORS:
        try:
            df = pd.read_csv(
                path, sep=sep, engine="python" if sep in ("α", None) else "c"
            )
        except Exception as e:  # pragma: no cover
            last_err = e
            continue
        if df.shape[1] <= 1 and sep is not None:
            continue  # wrong separator: everything in one column
        if expected_columns and not set(expected_columns).issubset(df.columns):
            continue
        return df
    if last_err:
        raise last_err
    raise ValueError(f"could not parse {path} with any separator")
