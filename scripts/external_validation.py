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

# severity words accepted in `<segment>_calcif_binary` columns (reference
# input spec, scripts/preprocess_dataset_README.md: "none" is negative,
# any named severity is positive)
_CALCIF_WORD = {"none": 0, "mild": 1, "moderate": 1, "severe": 1}

# the 18 coronary segments of the documented input template (reference
# utils/external_validation_constants.py REGRESSION_COLUMNS/BINARY_COLUMNS)
SEGMENTS = (
    "prox_rca", "mid_rca", "dist_rca", "pda", "posterolateral",
    "left_main", "prox_lad", "mid_lad", "dist_lad", "D1", "D2",
    "prox_lcx", "mid_lcx", "dist_lcx", "om1", "om2", "bx", "lvp",
)


def write_input_template(path) -> None:
    """Emit the documented input CSV template (reference
    scripts/preprocess_dataset_template.csv): per-segment stenosis percent,
    calcification severity word, CTO/thrombus booleans, study-level ids,
    one row per DICOM."""
    cols = {"ss_patient_id": ["P001", "P001"],
            "ss_event_cath_id": ["STUDY001", "STUDY001"]}
    for seg in SEGMENTS:
        cols[f"{seg}_stenosis"] = [0, 0]
    for seg in SEGMENTS:
        cols[f"{seg}_calcif_binary"] = ["none", "none"]
    for seg in SEGMENTS:
        cols[f"{seg}_cto"] = [False, False]
    for seg in SEGMENTS:
        cols[f"{seg}_thrombus"] = [False, False]
    cols["DICOMPath"] = ["/path/to/STUDY001_SERIES001.dcm",
                         "/path/to/STUDY001_SERIES002.dcm"]
    pd.DataFrame(cols).to_csv(path, index=False)


def parse_stenosis_cell(value):
    """One stenosis cell -> float percent or NaN.

    Numbers pass through; strings yield the LARGEST number they contain
    ("50-70%" -> 70.0, "occluded 100" -> 100.0); blank or number-free text
    is NaN (reference _parse_stenosis_value,
    scripts/external_validation.py:449-466).
    """
    import re

    if value is None or (isinstance(value, float) and np.isnan(value)):
        return np.nan
    if isinstance(value, (int, float, np.integer, np.floating)):
        return float(value)
    found = re.findall(r"\d+(?:\.\d+)?", str(value))
    return max(float(x) for x in found) if found else np.nan


def prepare_input_columns(df: pd.DataFrame, target_labels=(),
                          fill_missing_targets: bool = False) -> pd.DataFrame:
    """Normalize a CSV written to the documented input spec (reference
    scripts/preprocess_dataset_README.md + preprocess_dataset :536-607):

    - ``<seg>_calcif_binary``: none/mild/moderate/severe -> 0/1 (columns
      that are already numeric pass through unchanged);
    - ``<seg>_cto`` / ``<seg>_thrombus``: True/False -> 1/0;
    - every ``*_stenosis`` column is parsed to float percent and gains a
      derived ``*_stenosis_binary`` (1 where value > 70);
    - ``ss_patient_id`` -> ``Patient_ID``; ``ss_event_cath_id`` ->
      ``StudyInstanceUID`` (only when the latter is absent);
    - validation-capable runs (``fill_missing_targets``): requested target
      columns are created / NaN-filled with 0.0 (blank cells mean
      negative/normal, per the reference's stated assumption);
    - all-empty columns are dropped, except protected targets.
    """
    df = df.copy()

    for col in df.columns:
        if col.endswith("_calcif_binary"):
            cells = df[col].dropna()
            if len(cells) and cells.map(lambda v: isinstance(v, str)).any():
                df[col] = df[col].map(_CALCIF_WORD)
            else:
                df[col] = pd.to_numeric(df[col], errors="coerce")
        elif col.endswith("_cto") or col.endswith("_thrombus"):
            df[col] = df[col].map({False: 0, True: 1})

    for col in [c for c in df.columns if c.endswith("_stenosis")]:
        df[col] = df[col].map(parse_stenosis_cell)
        df[f"{col}_binary"] = (df[col] > 70).astype(int)

    renames = {}
    if "ss_patient_id" in df.columns:
        renames["ss_patient_id"] = "Patient_ID"
    if "ss_event_cath_id" in df.columns and "StudyInstanceUID" not in df.columns:
        renames["ss_event_cath_id"] = "StudyInstanceUID"
    df = df.rename(columns=renames)

    protected = set()
    if fill_missing_targets and target_labels:
        protected = set(target_labels)
        for label in target_labels:
            if label not in df.columns:
                df[label] = 0.0
            else:
                df[label] = df[label].fillna(0.0)

    empty = [c for c in df.columns
             if c not in protected and df[c].count() == 0]
    if empty:
        print(f"[external_validation] dropping {len(empty)} empty "
              f"columns: {empty}")
        df = df.drop(columns=empty)
    return df


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
    if "--write_template" in sys.argv:
        tp = argparse.ArgumentParser()
        tp.add_argument("--write_template",
                        help="emit the documented input CSV template and exit")
        path = tp.parse_known_args()[0].write_template
        write_input_template(path)
        print(f"[external_validation] wrote input template to {path}")
        return
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
    ap.add_argument("--fill_missing_targets", action="store_true",
                    help="validation-capable runs: create/zero-fill the "
                         "config's target columns (reference env "
                         "DEEPCORO_RUN_MODE=val|auto)")
    args, rest = ap.parse_known_args()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.read_csv(args.input_csv)

    # ---- stage 0: documented input spec -> framework columns ----
    fill = args.fill_missing_targets or (
        os.environ.get("DEEPCORO_RUN_MODE", "").strip().lower()
        in ("val", "auto")
    )
    targets = ()
    if fill:
        import yaml

        with open(args.base_config) as f:
            targets = tuple(yaml.safe_load(f).get("target_label", []) or ())
    df = prepare_input_columns(df, target_labels=targets,
                               fill_missing_targets=fill)

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
