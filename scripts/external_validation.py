"""External-validation pipeline: DICOM/AVI study CSV -> preprocessing ->
frozen-backbone linear-probing inference -> CSV artifacts.

Reference: scripts/external_validation.py:49-960 — Docker entry that converts
DICOMs to AVI (pydicom+ffmpeg), filters views with the VasoVision model,
generates a runtime DeepCORO config, and runs the linear-probing pipeline.

TPU build differences:
- DICOM decode is gated on pydicom (absent here -> inputs may already be
  AVI/.npy paths in the CSV);
- the VasoVision contrast/structure filter is an optional plug-in hook
  (``--filter_module``) rather than a bundled torch checkpoint;
- inference calls the runner in-process (no subprocess into a shell script).

Usage:
    python scripts/external_validation.py --input_csv studies.csv \
        --base_config config/linear_probing/stenosis_config.yaml \
        --checkpoint <probing_ckpt_dir> --output_dir results/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def dicom_to_npy(dicom_path: str, out_dir: Path) -> str | None:
    """Convert one DICOM to a .npy clip (reference process_single_dicom:610).
    Returns None when pydicom is unavailable or the file is unreadable."""
    try:
        import pydicom  # optional
    except ImportError:
        return None
    try:
        ds = pydicom.dcmread(dicom_path)
        arr = ds.pixel_array  # [F, H, W] or [F, H, W, C]
        if arr.ndim == 3:
            arr = arr[..., None].repeat(3, axis=-1)
        arr = np.clip(arr, 0, 255).astype(np.uint8)
        out = out_dir / (Path(dicom_path).stem + ".npy")
        np.save(out, arr)
        return str(out)
    except Exception as e:
        print(f"[external_validation] failed to convert {dicom_path}: {e}")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_csv", required=True,
                    help="CSV with DICOMPath or FileName column")
    ap.add_argument("--base_config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output_dir", default="results")
    ap.add_argument("--filter_module", default=None,
                    help="python module exposing filter_studies(df)->df "
                         "(the VasoVision role)")
    args, rest = ap.parse_known_args()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.read_csv(args.input_csv)

    # ---- stage 1: DICOM -> clip conversion where needed ----
    if "DICOMPath" in df.columns:
        clips_dir = out_dir / "clips"
        clips_dir.mkdir(exist_ok=True)
        paths = []
        for p in df["DICOMPath"]:
            out = dicom_to_npy(str(p), clips_dir)
            paths.append(out or "")
        df["FileName"] = paths
        df = df[df["FileName"] != ""]
        print(f"[external_validation] converted {len(df)} DICOMs")

    # ---- stage 2: optional view/contrast filter (VasoVision role) ----
    if args.filter_module:
        import importlib

        mod = importlib.import_module(args.filter_module)
        before = len(df)
        df = mod.filter_studies(df)
        print(f"[external_validation] filter kept {len(df)}/{before} rows")

    if "Split" not in df.columns:
        df["Split"] = "inference"
    runtime_csv = out_dir / "runtime_manifest.csv"
    df.to_csv(runtime_csv, sep="α", index=False)

    # ---- stage 3: runtime config + in-process probing inference ----
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner
    from deepcoro_clip_tpu.train.checkpoint import CheckpointManager

    register_all()
    cfg = parse_config(
        ["--base_config", args.base_config,
         "--data_filename", str(runtime_csv),
         "--run_mode", "inference"] + rest
    )
    runner = LinearProbingRunner(cfg, output_dir=out_dir)
    if args.checkpoint:
        runner.ckpt = CheckpointManager(args.checkpoint)
        runner.state = runner.ckpt.restore(runner.state, "checkpoint")
    preds = runner.inference(split="inference")
    preds.to_csv(out_dir / "predictions.csv", index=False)
    print(f"[external_validation] wrote {len(preds)} predictions to "
          f"{out_dir / 'predictions.csv'}")


if __name__ == "__main__":
    main()
