"""Per-severity retrieval recall from a retrieval_results CSV.

Reference counterpart: scripts/calculate_severity_recall.py (270 LoC) — how
well does retrieval rank the ground-truth text, broken down by the severity
class extracted from the GT text.

Usage: python scripts/calculate_severity_recall.py <retrieval_results.csv> [k]
"""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepcoro_clip_tpu.utils.stenosis_extractor import StenosisExtractor  # noqa: E402


def main(csv_path: str, k: int = 5):
    df = pd.read_csv(csv_path)
    ex = StenosisExtractor()

    def severity_of(text):
        findings = ex.extract(str(text))
        if not findings:
            return "normal"
        order = ["normal", "minimal", "mild", "moderate", "severe", "critical"]
        worst = max(
            findings.values(),
            key=lambda f: (f.cto, order.index(f.severity)
                           if f.severity in order else 0),
        )
        return "cto" if worst.cto else worst.severity

    df["severity"] = df["gt_text"].map(severity_of)
    out = (
        df.assign(hit=df["gt_rank"] <= k)
        .groupby("severity")
        .agg(n=("hit", "size"), recall=("hit", "mean"),
             median_rank=("gt_rank", "median"))
        .sort_index()
    )
    print(out.to_string(float_format=lambda v: f"{v:.3f}"))
    return out


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 5)
