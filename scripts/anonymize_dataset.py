"""Dataset anonymization: hash identifiers, strip PHI columns.

Reference counterpart: utils/anonyme_dataset_coro.py (578 LoC). Two modes:

simple (default): deterministic salted hashing of identifier columns
(stable join keys across files) and removal of configured PHI columns.

--tracking MAPPING.json: the reference's full reversible-with-mapping flow
(deepcoro_clip_tpu/data/anonymize.py) — per-column-type prefixed tokens
over the high-priority PHI list, year-only birth dates, a detailed
inversion mapping written to MAPPING.json (keep it OUT of the release!),
and an integrity verification printed at the end.

Usage:
    python scripts/anonymize_dataset.py --input data.csv --out anon.csv \
        --id_columns StudyInstanceUID,CathReport_MRN \
        --drop_columns PatientName,PatientBirthDate --salt mysalt
    python scripts/anonymize_dataset.py --input data.csv --out anon.csv \
        --tracking mapping.json --salt mysalt
"""

from __future__ import annotations

import argparse
import hashlib
from pathlib import Path

import pandas as pd

DEFAULT_PHI = [
    "PatientName", "PatientBirthDate", "PatientAddress", "PatientID",
    "ReferringPhysicianName", "InstitutionName", "OperatorsName",
    "AccessionNumber",
]


def stable_hash(value: str, salt: str, length: int = 16) -> str:
    return hashlib.sha256((salt + str(value)).encode()).hexdigest()[:length]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id_columns", default="StudyInstanceUID")
    ap.add_argument("--drop_columns", default=",".join(DEFAULT_PHI))
    ap.add_argument("--salt", required=True,
                    help="secret salt (keep private; same salt = same ids)")
    ap.add_argument("--tracking", default=None, metavar="MAPPING_JSON",
                    help="full reversible-with-mapping mode: write the "
                         "inversion mapping here (sensitive artifact)")
    args = ap.parse_args()

    sep = "α" if "α" in Path(args.input).read_text()[:2048] else ","
    df = pd.read_csv(args.input, sep=sep, engine="python" if sep == "α" else "c")
    if args.tracking:
        from deepcoro_clip_tpu.data.anonymize import (
            anonymize_with_tracking,
            get_anonymization_report,
            save_mapping,
            verify_anonymization_integrity,
        )

        df_anon, mapping = anonymize_with_tracking(df, salt=args.salt)
        save_mapping(mapping, args.tracking)
        df_anon.to_csv(args.out, sep=sep, index=False)
        report = verify_anonymization_integrity(df, df_anon, mapping)
        print(get_anonymization_report(mapping))
        print(f"integrity ok: {report['ok']} (leaks: {report['value_leaks']})")
        print(f"-> {args.out}; mapping -> {args.tracking} (KEEP PRIVATE)")
        return

    for col in args.id_columns.split(","):
        col = col.strip()
        if col in df.columns:
            df[col] = df[col].map(lambda v: stable_hash(v, args.salt))
    dropped = [c for c in args.drop_columns.split(",") if c.strip() in df.columns]
    df = df.drop(columns=dropped)
    df.to_csv(args.out, sep=sep, index=False)
    print(f"anonymized {len(df)} rows; hashed ids: {args.id_columns}; "
          f"dropped: {dropped} -> {args.out}")


if __name__ == "__main__":
    main()
