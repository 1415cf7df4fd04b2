"""Dataset anonymization: hash identifiers, strip PHI columns.

Reference counterpart: utils/anonyme_dataset_coro.py (578 LoC). Deterministic
salted hashing of identifier columns (stable join keys across files) and
removal of configured PHI columns.

Usage:
    python scripts/anonymize_dataset.py --input data.csv --out anon.csv \
        --id_columns StudyInstanceUID,CathReport_MRN \
        --drop_columns PatientName,PatientBirthDate --salt mysalt
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
    args = ap.parse_args()

    sep = "α" if "α" in Path(args.input).read_text()[:2048] else ","
    df = pd.read_csv(args.input, sep=sep, engine="python" if sep == "α" else "c")
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
