"""External-validation pipeline: DICOM/AVI study CSV -> multiprocess
conversion -> view/contrast/diagnostic filtering -> frozen-backbone
linear-probing inference -> CSV artifacts.

Reference: scripts/external_validation.py:49-960 — the Docker deployment
entry that converts DICOMs to AVI with a multiprocessing pool (:747-757),
filters views with the VasoVision model (:815-875), assigns PCI/POST_PCI/
diagnostic procedure status (:653-707), generates a runtime DeepCORO config
and runs linear-probing inference (:902-925).

TPU build:
- conversion farm: ProcessPoolExecutor over pydicom (gated — .avi/.mp4/.npy
  inputs pass straight through to the framework's own decoder);
- the VasoVision role is served by ANY DeepCORO linear-probing run that
  predicts main_structure / contrast_agent / stent_presence heads
  (``--filter_config`` + ``--filter_checkpoint``), by a plug-in module
  (``--filter_module``), or by pre-existing columns in the CSV; the
  reference's keep rule (coronary structure + contrast + diagnostic status)
  is applied either way;
- inference calls the runner in-process; deploy/Dockerfile packages it.

Usage:
    python scripts/external_validation.py --input_csv studies.csv \
        --base_config config/linear_probing/stenosis_config.yaml \
        --checkpoint <probing_ckpt_dir> --output_dir results/ \
        [--filter_config cfg.yaml --filter_checkpoint <ckpt_dir>] \
        [--filter_module my_filter] [--workers 8]
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# main_structure class ids (the reference reads them from the VasoVision
# config's labels_map; these are its published values)
RIGHT_CORONARY = 0
LEFT_CORONARY = 1
CONTRAST_YES = 1


def dicom_to_npy(args) -> Optional[str]:
    """Convert one DICOM to a .npy clip (reference process_single_dicom:610).
    Module-level so it pickles into pool workers."""
    dicom_path, out_dir = args
    try:
        import pydicom  # optional dependency
    except ImportError:
        return None
    try:
        ds = pydicom.dcmread(dicom_path)
        arr = ds.pixel_array  # [F, H, W] or [F, H, W, C]
        if arr.ndim == 2:
            arr = arr[None]
        if arr.ndim == 3:
            arr = arr[..., None].repeat(3, axis=-1)
        arr = np.clip(arr, 0, 255).astype(np.uint8)
        out = Path(out_dir) / (Path(dicom_path).stem + ".npy")
        np.save(out, arr)
        return str(out)
    except Exception as e:  # noqa: BLE001 - per-file fault tolerance
        print(f"[external_validation] failed to convert {dicom_path}: {e}")
        return None


def convert_dicoms(df: pd.DataFrame, out_dir: Path,
                   workers: Optional[int] = None) -> pd.DataFrame:
    """Multiprocess DICOM->npy farm (reference mp.Pool(<=8).imap :747-757).
    Non-DICOM rows (.avi/.mp4/.npy) pass through untouched."""
    clips_dir = out_dir / "clips"
    clips_dir.mkdir(parents=True, exist_ok=True)
    df = df.copy()
    passthrough = df["DICOMPath"].astype(str).str.lower().str.endswith(
        (".avi", ".mp4", ".npy", ".npz"))
    tasks = [(str(p), str(clips_dir))
             for p in df.loc[~passthrough, "DICOMPath"]]
    workers = workers or min(8, os.cpu_count() or 1)
    results = []
    if tasks:
        if workers > 1:
            with ProcessPoolExecutor(max_workers=workers) as pool:
                results = list(pool.map(dicom_to_npy, tasks))
        else:
            results = [dicom_to_npy(t) for t in tasks]
    paths = []
    it = iter(results)
    for p, through in zip(df["DICOMPath"].astype(str), passthrough):
        paths.append(p if through else (next(it) or ""))
    df["FileName"] = paths
    kept = df[df["FileName"] != ""].reset_index(drop=True)
    print(f"[external_validation] {len(kept)}/{len(df)} rows have clips")
    return kept


def assign_procedure_status(df: pd.DataFrame) -> pd.DataFrame:
    """PCI / POST_PCI / diagnostic status per row (reference :653-707):
    PCI = stent placed this acquisition; POST_PCI = a later acquisition of a
    study that already had a PCI (with contrast); diagnostic = no PCI seen
    yet in the study."""
    out = df.copy()
    out["status"] = "unknown"
    is_pci = out.get("stent_presence", pd.Series(0, index=out.index)).eq(1)
    pci_seen_before = (
        is_pci.groupby(out["StudyInstanceUID"], sort=False)
        .transform(lambda x: x.cumsum().shift(fill_value=0)).astype(bool)
    )
    contrast = out.get("contrast_agent", pd.Series(1, index=out.index)).eq(
        CONTRAST_YES)
    out.loc[is_pci, "status"] = "PCI"
    out.loc[~is_pci & pci_seen_before & contrast, "status"] = "POST_PCI"
    out.loc[~is_pci & ~pci_seen_before, "status"] = "diagnostic"
    return out


def apply_reference_filter(df: pd.DataFrame) -> pd.DataFrame:
    """The reference keep rule (:855-875): coronary main_structure,
    contrast agent detected, diagnostic procedure status."""
    df = assign_procedure_status(df)
    keep = pd.Series(True, index=df.index)
    if "main_structure" in df.columns:
        ms = pd.to_numeric(df["main_structure"], errors="coerce")
        keep &= ms.isin([RIGHT_CORONARY, LEFT_CORONARY])
    if "contrast_agent" in df.columns:
        keep &= pd.to_numeric(
            df["contrast_agent"], errors="coerce").eq(CONTRAST_YES)
    keep &= df["status"].eq("diagnostic")
    out = df[keep].reset_index(drop=True)
    if out.empty:
        raise RuntimeError(
            "No rows remain after view/contrast/diagnostic filtering")
    return out


def run_filter_model(df: pd.DataFrame, manifest: Path, filter_config: str,
                     filter_checkpoint: Optional[str], out_dir: Path,
                     extra: list) -> pd.DataFrame:
    """Serve the VasoVision role with a DeepCORO linear-probing model:
    run inference to produce main_structure / contrast_agent /
    stent_presence columns, merged back by FileName."""
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner
    from deepcoro_clip_tpu.train.checkpoint import CheckpointManager

    register_all()
    cfg = parse_config(
        ["--base_config", filter_config,
         "--data_filename", str(manifest),
         "--run_mode", "inference"] + extra
    )
    runner = LinearProbingRunner(cfg, output_dir=out_dir / "filter_model")
    if filter_checkpoint:
        runner.ckpt = CheckpointManager(filter_checkpoint)
        runner.state = runner.ckpt.restore(runner.state, "checkpoint")
    preds = runner.inference(split="inference")
    # binary heads -> class decisions
    for head in ("main_structure", "contrast_agent", "stent_presence"):
        col = next((c for c in preds.columns if c.startswith(head)), None)
        if col is None:
            continue
        vals = preds[col].to_numpy(float)
        if head == "main_structure":
            preds[head] = vals.round().astype(int)
        else:
            preds[head] = (vals > 0.5).astype(int)
    keep_cols = ["FileName"] + [
        h for h in ("main_structure", "contrast_agent", "stent_presence")
        if h in preds.columns
    ]
    return df.drop(
        columns=[c for c in keep_cols[1:] if c in df.columns]
    ).merge(preds[keep_cols], on="FileName", how="left")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_csv", required=True,
                    help="CSV with DICOMPath or FileName column")
    ap.add_argument("--base_config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output_dir", default="results")
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--filter_module", default=None,
                    help="python module exposing filter_studies(df)->df")
    ap.add_argument("--filter_config", default=None,
                    help="probing config whose model predicts "
                         "main_structure/contrast_agent/stent_presence "
                         "(the VasoVision role)")
    ap.add_argument("--filter_checkpoint", default=None)
    ap.add_argument("--skip_reference_filter", action="store_true")
    args, rest = ap.parse_known_args()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.read_csv(args.input_csv)

    # ---- stage 1: multiprocess DICOM -> clip conversion ----
    if "DICOMPath" in df.columns:
        df = convert_dicoms(df, out_dir, args.workers)

    if "Split" not in df.columns:
        df["Split"] = "inference"
    manifest = out_dir / "runtime_manifest.csv"
    df.to_csv(manifest, sep="α", index=False)

    # ---- stage 2: view/contrast/diagnostic filtering ----
    if args.filter_config:
        df = run_filter_model(df, manifest, args.filter_config,
                              args.filter_checkpoint, out_dir, rest)
    if args.filter_module:
        import importlib

        mod = importlib.import_module(args.filter_module)
        before = len(df)
        df = mod.filter_studies(df)
        print(f"[external_validation] plug-in filter kept "
              f"{len(df)}/{before} rows")
    if not args.skip_reference_filter and (
        {"main_structure", "contrast_agent", "stent_presence"}
        & set(df.columns)
    ):
        before = len(df)
        df = apply_reference_filter(df)
        print(f"[external_validation] reference filter kept "
              f"{len(df)}/{before} rows")
    df.to_csv(manifest, sep="α", index=False)

    # ---- stage 3: runtime config + in-process probing inference ----
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner
    from deepcoro_clip_tpu.train.checkpoint import CheckpointManager

    register_all()
    cfg = parse_config(
        ["--base_config", args.base_config,
         "--data_filename", str(manifest),
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
