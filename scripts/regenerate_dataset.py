"""Regenerate an inference dataset with the corrected status cascade.

Portable CLI counterpart of the reference's site-specific
``scripts/regenerate_dataset.py`` (which hardcodes hospital paths): applies
class-id maps, acquisition-time sorting (DICOM timestamp from the SOP UID
in FileName, series_time fallback), the PCI/POST_PCI/diagnostic cascade
with GT-pcidone gating, congenital / no-stenosis exclusion, the
test->inference split rename, and report regeneration — then writes both
the full frame with statuses and the inference CSV (α-separated).

Usage:
  python scripts/regenerate_dataset.py --input data.parquet \
      --output_dir out/ [--csv_sep α] [--no_coronary_specific]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    import pandas as pd

    from deepcoro_clip_tpu.data.dataset_creation import (
        DOMINANCE_NAMES,
        MAIN_STRUCTURE_NAMES,
        assign_procedure_status,
        inference_filter_mask,
        regenerate_dataset,
        sort_by_acquisition_time,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet or (α/CSV) video-level dataset")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--csv_sep", default="α")
    ap.add_argument("--no_coronary_specific", action="store_true")
    args = ap.parse_args()

    src = Path(args.input)
    if src.suffix == ".parquet":
        df = pd.read_parquet(src)
    else:
        df = pd.read_csv(src, sep=args.csv_sep, engine="python")
    print(f"loaded {len(df)} rows, {df.shape[1]} columns")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # full frame with regenerated statuses (kept for auditing)
    full = df.copy()
    if "main_structure_class" in full.columns:
        full["main_structure_name"] = full["main_structure_class"].map(
            MAIN_STRUCTURE_NAMES)
    if "dominance_class" in full.columns:
        full["dominance_name"] = full["dominance_class"].map(DOMINANCE_NAMES)
    full = sort_by_acquisition_time(full)
    old = full["status"].copy() if "status" in full.columns else None
    full = assign_procedure_status(full)
    if old is not None:
        changed = int((full["status"] != old.reindex(full.index)).sum())
        print(f"status changes vs original: {changed}/{len(full)}")
    print("status distribution:", full["status"].value_counts().to_dict())
    full_path = out_dir / (src.stem + "_with_status.parquet")
    try:
        full.to_parquet(full_path, index=False)
    except Exception:  # pyarrow not installed -> CSV fallback
        full_path = out_dir / (src.stem + "_with_status.csv")
        full.to_csv(full_path, index=False, sep=args.csv_sep)
    print(f"wrote {full_path}")

    diag = regenerate_dataset(
        df, coronary_specific=not args.no_coronary_specific)
    print(f"inference rows: {len(diag)} "
          f"(filter kept {inference_filter_mask(full).sum()} of {len(full)})")
    if "Split" in diag.columns:
        print("split distribution:", diag["Split"].value_counts().to_dict())
    inf_path = out_dir / "inference_regenerated.csv"
    diag.to_csv(inf_path, index=False, sep=args.csv_sep)
    print(f"wrote {inf_path}")


if __name__ == "__main__":
    main()
