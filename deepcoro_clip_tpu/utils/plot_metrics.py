"""Plotting suite: training curves, retrieval panels, confusion matrices.

Reference counterpart: utils/plot_metrics.py (2422 LoC of matplotlib panels)
— distilled to the panels the runners actually produce, reading the run dir's
``metrics.jsonl`` history (utils/logging_utils.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_history(run_dir: str | Path) -> List[Dict]:
    path = Path(run_dir) / "metrics.jsonl"
    if not path.exists():
        return []
    return [json.loads(l) for l in path.read_text().splitlines() if l.strip()]


def plot_training_curves(
    run_dir: str | Path,
    keys: Sequence[str] = ("train/loss", "val/loss"),
    out: Optional[str | Path] = None,
):
    hist = load_history(run_dir)
    fig, ax = plt.subplots(figsize=(7, 4))
    for key in keys:
        pts = [(h.get("step", i), h[key]) for i, h in enumerate(hist) if key in h]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, marker="o", label=key)
    ax.set_xlabel("epoch")
    ax.set_ylabel("value")
    ax.legend()
    ax.grid(alpha=0.3)
    out = out or Path(run_dir) / "training_curves.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_retrieval_metrics(run_dir: str | Path, out: Optional[str | Path] = None):
    hist = load_history(run_dir)
    keys = sorted(
        {k for h in hist for k in h if k.startswith("val/Recall@") or k == "val/MRR"}
    )
    return plot_training_curves(run_dir, keys, out or Path(run_dir) / "retrieval.png")


def plot_confusion_matrix(
    confusion: Dict[str, int], title: str = "", out: str | Path = "confusion.png"
):
    mat = np.array(
        [[confusion["tn"], confusion["fp"]], [confusion["fn"], confusion["tp"]]]
    )
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(mat, cmap="Blues")
    for i in range(2):
        for j in range(2):
            ax.text(j, i, str(mat[i, j]), ha="center", va="center")
    ax.set_xticks([0, 1], ["pred 0", "pred 1"])
    ax.set_yticks([0, 1], ["true 0", "true 1"])
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_prediction_scatter(
    preds: np.ndarray, targets: np.ndarray, head: str = "",
    out: str | Path = "scatter.png",
):
    fig, ax = plt.subplots(figsize=(4.5, 4.5))
    ax.scatter(targets, preds, s=12, alpha=0.6)
    lo = float(min(np.min(targets), np.min(preds)))
    hi = float(max(np.max(targets), np.max(preds)))
    ax.plot([lo, hi], [lo, hi], "k--", lw=1)
    ax.set_xlabel(f"{head} target")
    ax.set_ylabel(f"{head} prediction")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_epoch_metrics_line_charts(
    trajectory, out: str | Path = "epoch_metrics.png",
    metric_suffix: str = "mae",
):
    """Per-vessel metric trajectories across validation epochs (reference
    plot_epoch_metrics_line_charts in utils/plot_metrics.py), fed by
    data/study_analysis.run_multi_epoch_analysis output (a DataFrame or CSV
    path with an ``epoch`` column and ``<vessel>/<metric>`` columns)."""
    import pandas as pd

    df = pd.read_csv(trajectory) if isinstance(trajectory, (str, Path)) \
        else trajectory
    cols = [c for c in df.columns if c.endswith(f"/{metric_suffix}")]
    if not cols:
        return None
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for c in cols:
        ax.plot(df["epoch"], df[c], marker="o",
                label=c.rsplit("/", 1)[0].replace("_stenosis", ""))
    ax.set_xlabel("epoch")
    ax.set_ylabel(metric_suffix)
    ax.legend(fontsize=7, ncols=2)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def _load_trajectory(trajectory):
    import pandas as pd

    return (pd.read_csv(trajectory)
            if isinstance(trajectory, (str, Path)) else trajectory)


def _metric_suffixes(df) -> List[str]:
    return sorted({c.rsplit("/", 1)[1] for c in df.columns if "/" in c})


# Coronary-system grouping (reference plot_system_specific_metrics_line_charts
# :205 and plot_coronary_artery_specific_metrics_line_charts :359).
VESSEL_SYSTEMS = {
    "left": ("left_main", "lad", "d1", "d2", "ramus"),
    "circumflex": ("lcx", "om1", "om2", "lvp"),
    "right": ("rca", "pda", "posterolateral"),
}


def _vessel_in_system(vessel: str, system: Optional[str]) -> bool:
    if system is None:
        return True
    return any(tok in vessel for tok in VESSEL_SYSTEMS.get(system, ()))


def plot_multi_epoch_metrics_comprehensive(
    trajectory, out: str | Path = "multi_epoch_metrics.png",
    system: Optional[str] = None,
):
    """One subplot per metric (mae / corr / auroc@70 / ...), every vessel a
    line, the study_max composite bold (reference
    plot_multi_epoch_metrics_comprehensive :1103, plot_stenosis_trends :1311,
    plot_ifr_trends :1824 — same machinery, columns select the task).
    ``system`` filters vessels to one coronary system (reference :205,:359)."""
    df = _load_trajectory(trajectory)
    suffixes = _metric_suffixes(df)
    suffixes = [s for s in suffixes if s != "n"]
    if not suffixes or "epoch" not in df.columns:
        return None
    ncols = min(3, len(suffixes))
    nrows = (len(suffixes) + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(5.5 * ncols, 3.8 * nrows), squeeze=False
    )
    for ax, suffix in zip(axes.flat, suffixes):
        for c in df.columns:
            if not c.endswith(f"/{suffix}"):
                continue
            vessel = c.rsplit("/", 1)[0]
            if vessel == "study_max":
                ax.plot(df["epoch"], df[c], "k-", lw=2.2, marker="s",
                        label="study_max", zorder=5)
            elif _vessel_in_system(vessel, system):
                ax.plot(df["epoch"], df[c], marker="o", ms=3, alpha=0.7,
                        label=vessel.replace("_stenosis", ""))
        ax.set_xlabel("epoch")
        ax.set_title(suffix)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=6, ncols=2)
    for ax in axes.flat[len(suffixes):]:
        ax.axis("off")
    fig.suptitle(f"per-vessel metric trajectories"
                 + (f" — {system} system" if system else ""))
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_ground_truth_comparison(
    agg_pred, agg_gt, vessel_labels: Optional[Sequence[str]] = None,
    study_col: str = "StudyInstanceUID",
    out: str | Path = "gt_comparison.png",
):
    """Per-vessel prediction-vs-ground-truth scatter grid with identity line
    and MAE/corr annotations (reference plot_ground_truth_comparison_results
    :525), over study-aggregated frames from
    data/study_analysis.aggregate_study_level_data."""
    from deepcoro_clip_tpu.data.study_analysis import DEFAULT_VESSEL_LABELS

    vessel_labels = list(vessel_labels or DEFAULT_VESSEL_LABELS)
    merged = agg_pred.merge(agg_gt, on=study_col, suffixes=("_pred", "_gt"))
    present = [
        v for v in vessel_labels
        if f"{v}_pred" in merged.columns and f"{v}_gt" in merged.columns
        and (merged[f"{v}_pred"].notna() & merged[f"{v}_gt"].notna()).sum() >= 2
    ]
    if not present:
        return None
    ncols = min(4, len(present))
    nrows = (len(present) + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(3.4 * ncols, 3.2 * nrows), squeeze=False
    )
    for ax, v in zip(axes.flat, present):
        m = merged[f"{v}_pred"].notna() & merged[f"{v}_gt"].notna()
        p = merged.loc[m, f"{v}_pred"].to_numpy(float)
        g = merged.loc[m, f"{v}_gt"].to_numpy(float)
        ax.scatter(g, p, s=10, alpha=0.5)
        lo, hi = float(min(g.min(), p.min())), float(max(g.max(), p.max()))
        ax.plot([lo, hi], [lo, hi], "k--", lw=1)
        mae = float(np.mean(np.abs(p - g)))
        note = f"MAE {mae:.1f}"
        if np.std(p) > 1e-9 and np.std(g) > 1e-9:
            note += f"  r {np.corrcoef(p, g)[0, 1]:.2f}"
        ax.set_title(f"{v.replace('_stenosis', '')}  ({note})", fontsize=8)
        ax.grid(alpha=0.3)
    for ax in axes.flat[len(present):]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def create_combined_performance_analysis(
    trajectory, out: str | Path = "combined_performance.png",
):
    """Best-epoch dashboard: for each metric column, final-epoch value vs
    best-epoch value, annotated with the best epoch (reference
    create_combined_performance_analysis :1916,
    analyze_trends_over_epochs :2060). Returns (path, summary DataFrame)."""
    import pandas as pd

    df = _load_trajectory(trajectory)
    if "epoch" not in df.columns or len(df) == 0:
        return None
    rows = []
    for c in df.columns:
        if c == "epoch" or c.endswith("/n"):
            continue
        s = df[c].astype(float)
        if s.notna().sum() == 0:
            continue
        # lower is better for error metrics, higher for corr/auroc
        minimize = any(tok in c for tok in ("mae", "mse", "rmse", "loss"))
        best_i = int(s.idxmin() if minimize else s.idxmax())
        rows.append({
            "metric": c,
            "final": float(s.iloc[-1]),
            "best": float(s.iloc[best_i]),
            "best_epoch": int(df["epoch"].iloc[best_i]),
            "minimize": minimize,
        })
    summary = pd.DataFrame(rows)
    if summary.empty:
        return None
    fig, ax = plt.subplots(
        figsize=(max(7, 0.45 * len(summary)), 4.5)
    )
    x = np.arange(len(summary))
    ax.bar(x - 0.2, summary["final"], width=0.4, label="final epoch")
    ax.bar(x + 0.2, summary["best"], width=0.4, label="best epoch")
    for i, r in summary.iterrows():
        ax.text(i + 0.2, r["best"], f"e{r['best_epoch']}",
                ha="center", va="bottom", fontsize=6)
    ax.set_xticks(x, [m.replace("_stenosis", "") for m in summary["metric"]],
                  rotation=75, fontsize=6)
    ax.legend()
    ax.grid(alpha=0.3, axis="y")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out), summary


def plot_categorical_trends(
    trajectory, prefix: str, out: Optional[str | Path] = None,
):
    """Trend lines for categorical heads (reference
    plot_calcification_by_severity_trends :1502 /
    plot_calcification_trends :1696): plots every ``<prefix>*/<metric>``
    column trajectory, one subplot per metric."""
    df = _load_trajectory(trajectory)
    cols = [c for c in df.columns if c.startswith(prefix) and "/" in c]
    if not cols or "epoch" not in df.columns:
        return None
    suffixes = sorted({c.rsplit("/", 1)[1] for c in cols if
                       c.rsplit("/", 1)[1] != "n"})
    fig, axes = plt.subplots(
        1, max(1, len(suffixes)), figsize=(5.5 * max(1, len(suffixes)), 4),
        squeeze=False,
    )
    for ax, suffix in zip(axes.flat, suffixes):
        for c in cols:
            if c.endswith(f"/{suffix}"):
                ax.plot(df["epoch"], df[c], marker="o", ms=3,
                        label=c.rsplit("/", 1)[0])
        ax.set_xlabel("epoch")
        ax.set_title(f"{prefix} {suffix}")
        ax.grid(alpha=0.3)
        ax.legend(fontsize=6)
    out = out or f"{prefix}_trends.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_stenosis_predictions_for_study(
    agg_df, study: str, vessel_labels: Optional[Sequence[str]] = None,
    study_col: str = "StudyInstanceUID",
    out: str | Path = "stenosis_predictions.png",
    title_suffix: str = "",
):
    """One study's predicted vs ground-truth stenosis as grouped bars per
    vessel (reference plot_stenosis_predictions_for_file :729 /
    display_stenosis_predictions_for_file :687), from a frame carrying
    ``pred_<vessel>`` / ``gt_<vessel>`` columns
    (data/study_analysis.create_study_level_predictions output)."""
    from deepcoro_clip_tpu.data.study_analysis import DEFAULT_VESSEL_LABELS

    row = agg_df[agg_df[study_col] == study]
    if row.empty:
        return None
    row = row.iloc[0]
    vessel_labels = list(vessel_labels or DEFAULT_VESSEL_LABELS)
    names, preds, gts = [], [], []
    for v in vessel_labels:
        p, g = row.get(f"pred_{v}"), row.get(f"gt_{v}")
        if p is None and g is None:
            continue
        if (p is None or (isinstance(p, float) and np.isnan(p))) and \
                (g is None or (isinstance(g, float) and np.isnan(g))):
            continue
        names.append(v.replace("_stenosis", ""))
        preds.append(np.nan if p is None else float(p))
        gts.append(np.nan if g is None else float(g))
    if not names:
        return None
    x = np.arange(len(names))
    fig, ax = plt.subplots(figsize=(max(6, 0.6 * len(names)), 4))
    ax.bar(x - 0.2, gts, width=0.4, label="ground truth")
    ax.bar(x + 0.2, preds, width=0.4, label="predicted")
    ax.axhline(70, color="r", ls="--", lw=1, label="70% line")
    ax.set_xticks(x)
    ax.set_xticklabels(names, rotation=60, ha="right", fontsize=8)
    ax.set_ylabel("stenosis %")
    ax.set_title(f"{study}{(' — ' + title_suffix) if title_suffix else ''}")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3, axis="y")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def save_plots_to_files(output_dir: str | Path,
                        plots_subdir: str = "plots") -> List[Path]:
    """Flush every currently open matplotlib figure to numbered PNGs under
    ``output_dir/plots_subdir`` and close them (reference
    save_plots_to_files :2127)."""
    out = Path(output_dir) / plots_subdir
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for num in plt.get_fignums():
        fig = plt.figure(num)
        p = out / f"figure_{num:03d}.png"
        fig.savefig(p, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(p)
    return written


def plot_grad_norms(run_dir: str | Path, out: Optional[str | Path] = None):
    """Per-module gradient-norm curves from the step metrics (reference
    log_gradient_norms, utils/wandb_logger.py:491-510)."""
    hist = load_history(run_dir)
    keys = sorted({k for h in hist for k in h
                   if "grad_norm" in k})
    if not keys:
        return None
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for key in keys:
        pts = [(h.get("step", i), h[key]) for i, h in enumerate(hist)
               if key in h and isinstance(h[key], (int, float))]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, label=key.split("/")[-1], alpha=0.8)
    ax.set_xlabel("step")
    ax.set_ylabel("grad norm")
    ax.set_yscale("log")
    ax.legend(fontsize=7, ncols=2)
    ax.grid(alpha=0.3)
    out = out or Path(run_dir) / "grad_norms.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_run_summary(run_dir: str | Path) -> List[Path]:
    """Every applicable panel for a run dir in one call (the role of the
    reference's 2,422-LoC plot_metrics suite entry points)."""
    outs = []
    for fn in (plot_training_curves, plot_retrieval_metrics, plot_grad_norms,
               plot_calcification_by_severity,
               plot_calcification_by_vessel_location):
        try:
            p = fn(run_dir)
            if p is not None:
                outs.append(p)
        except Exception:
            continue
    # trajectory panels when a multi-epoch analysis CSV exists (the
    # reference's save_plots_to_files :2127 role)
    traj = Path(run_dir) / "epoch_trajectory.csv"
    if traj.exists():
        for fn, name in (
            (plot_multi_epoch_metrics_comprehensive, "multi_epoch_metrics.png"),
            (create_combined_performance_analysis, "combined_performance.png"),
        ):
            try:
                p = fn(traj, out=Path(run_dir) / name)
                if p is not None:
                    outs.append(p[0] if isinstance(p, tuple) else p)
            except Exception:
                continue
    return outs


# ------------------------------------------------------------------ #
# calcification trend analyses (reference debug_calcification_by_severity
# utils/plot_metrics.py:1377-1502 and analyze_calcification_by_vessel_location
# :2154-2290): group per-class calcification metrics by severity level /
# anatomical vessel system and chart the multi-epoch trends.
# ------------------------------------------------------------------ #

CALCIF_SEVERITY_PATTERNS = {
    "no": ("no_calcif", "_no_", "_none_", "absent", "zero", "0_calcif"),
    "mild": ("mild", "light", "minimal", "1_calcif", "low"),
    "moderate": ("moderate", "mod_", "2_calcif", "medium"),
    "severe": ("severe", "heavy", "extensive", "3_calcif", "high", "max"),
}

CALCIF_VESSEL_GROUPS = {
    "Left Main": ("left_main_calcif",),
    "LAD System": ("prox_lad_calcif", "mid_lad_calcif", "dist_lad_calcif",
                   "d1_calcif", "d2_calcif"),
    "LCX System": ("prox_lcx_calcif", "dist_lcx_calcif", "lvp_calcif",
                   "om1_calcif", "om2_calcif"),
    "RCA System": ("prox_rca_calcif", "mid_rca_calcif", "dist_rca_calcif",
                   "pda_calcif", "posterolateral_calcif"),
    "Other": ("bx_calcif", "ramus_calcif"),
}


def _calcif_epoch_metrics(run_dir: str | Path) -> tuple[list, list]:
    """(epochs, per-epoch {metric: value}) for every val metric whose name
    mentions calcification."""
    rows = load_history(run_dir)
    epochs, per_epoch = [], []
    for d in rows:
        vals = {k[4:]: v for k, v in d.items()
                if k.startswith("val/") and "calcif" in k.lower()
                and isinstance(v, (int, float))}
        if vals:
            epochs.append(d.get("step", len(epochs)))
            per_epoch.append(vals)
    return epochs, per_epoch


def _group_trends(per_epoch, groups, match):
    """{group: {"metrics": sorted names, "trend": [per-epoch mean]}}"""
    import numpy as np

    names = set()
    for m in per_epoch:
        names.update(m)
    out = {}
    for group, patterns in groups.items():
        members = sorted(n for n in names if match(n.lower(), patterns))
        if not members:
            continue
        trend = []
        for m in per_epoch:
            vals = [m[n] for n in members if n in m
                    and np.isfinite(m[n])]
            trend.append(float(np.mean(vals)) if vals else float("nan"))
        out[group] = {"metrics": members, "trend": trend}
    return out


def calcification_by_severity(per_epoch_metrics) -> Dict:
    """Severity-level grouping via the reference's substring patterns."""
    return _group_trends(
        per_epoch_metrics, CALCIF_SEVERITY_PATTERNS,
        lambda name, pats: any(p in name for p in pats),
    )


def calcification_by_vessel_location(per_epoch_metrics) -> Dict:
    """Anatomical vessel-system grouping (exact vessel tokens)."""
    return _group_trends(
        per_epoch_metrics, CALCIF_VESSEL_GROUPS,
        lambda name, pats: any(p in name for p in pats),
    )


def _plot_group_trends(epochs, grouped, ylabel, out):
    if not grouped:
        return None
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for group, d in grouped.items():
        ax.plot(epochs, d["trend"], marker="o",
                label=f"{group} (n={len(d['metrics'])})")
    ax.set_xlabel("epoch")
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_calcification_by_severity(run_dir: str | Path,
                                   out: Optional[str | Path] = None):
    epochs, per_epoch = _calcif_epoch_metrics(run_dir)
    if not per_epoch:
        return None
    out = out or Path(run_dir) / "calcification_by_severity.png"
    return _plot_group_trends(
        epochs, calcification_by_severity(per_epoch),
        "mean calcification metric", out,
    )


def plot_calcification_by_vessel_location(run_dir: str | Path,
                                          out: Optional[str | Path] = None):
    epochs, per_epoch = _calcif_epoch_metrics(run_dir)
    if not per_epoch:
        return None
    out = out or Path(run_dir) / "calcification_by_vessel_location.png"
    return _plot_group_trends(
        epochs, calcification_by_vessel_location(per_epoch),
        "mean calcification metric", out,
    )


# --- system / dominance-area averaged trajectories + IFR trends ------------
# Reference: plot_system_specific_metrics_line_charts (utils/plot_metrics.py
# :205), plot_coronary_artery_specific_metrics_line_charts (:359) and
# plot_ifr_trends (:1824). Same trajectory-DataFrame input as the
# comprehensive panel (epoch column + "<vessel>/<metric>" columns) instead
# of the reference's nested results_dict — the averaging semantics match:
# per-epoch nan-mean over the group's vessels, one line per metric family.


def _group_metric_trajectories(df, vessels: Sequence[str]):
    """{metric_suffix: (means, sds)} averaged across ``vessels`` per epoch."""
    out = {}
    for suffix in _metric_suffixes(df):
        if suffix == "n":
            continue
        cols = [c for c in df.columns
                if c.endswith(f"/{suffix}") and c.rsplit("/", 1)[0] in vessels]
        if not cols:
            continue
        vals = df[cols].to_numpy(dtype=float)
        with np.errstate(invalid="ignore"):
            means = np.nanmean(vals, axis=1)
            sds = np.nanstd(vals, axis=1)
        if np.isnan(means).all():
            continue
        out[suffix] = (means, sds)
    return out


def _plot_avg_trajectories(df, vessels, group_name, out):
    grouped = _group_metric_trajectories(df, list(vessels))
    if not grouped or "epoch" not in df.columns:
        return None
    ncols = min(3, len(grouped))
    nrows = (len(grouped) + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(5.5 * ncols, 3.6 * nrows), squeeze=False)
    for ax, (suffix, (means, sds)) in zip(axes.flat, sorted(grouped.items())):
        ax.plot(df["epoch"], means, marker="o", color="tab:blue",
                label=f"{group_name} {suffix} (avg)")
        ax.errorbar(df["epoch"], means, yerr=sds, fmt="none",
                    ecolor="lightblue", alpha=0.7, capsize=3)
        ax.set_xlabel("epoch")
        ax.set_ylabel(suffix)
        ax.grid(alpha=0.3, linestyle=":")
        ax.legend(fontsize=8)
    for ax in axes.flat[len(grouped):]:
        ax.axis("off")
    fig.suptitle(f"{group_name}: vessel-averaged metric trajectories")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def plot_system_specific_metrics_line_charts(
    trajectory, system_name: str,
    system_vessel_labels: Optional[Sequence[str]] = None,
    out: str | Path = "system_metrics.png",
):
    """Average metric trajectories for ONE coronary system (reference :205):
    every metric family in the trajectory, nan-averaged over the system's
    vessels per epoch, with a cross-vessel sd band. ``system_name`` may be a
    VESSEL_SYSTEMS key ("left"/"circumflex"/"right") or any label when
    explicit ``system_vessel_labels`` are given."""
    df = _load_trajectory(trajectory)
    if system_vessel_labels is None:
        toks = VESSEL_SYSTEMS.get(system_name.lower())
        if toks is None:
            return None
        system_vessel_labels = [
            c.rsplit("/", 1)[0] for c in df.columns if "/" in c
            and any(t in c for t in toks)]
    return _plot_avg_trajectories(df, system_vessel_labels, system_name, out)


def plot_coronary_artery_specific_metrics_line_charts(
    trajectory, coronary_artery: str,
    out: str | Path = "coronary_area_metrics.png",
):
    """Average metric trajectories for the left/right DOMINANCE area
    (reference :359): vessel membership comes from the dominance-aware
    groupings in data/study_analysis (clean_study_analysis.py:61-62)."""
    from deepcoro_clip_tpu.data.study_analysis import (
        LEFT_CORONARY_DOMINANCE_VESSELS,
        RIGHT_CORONARY_DOMINANCE_VESSELS,
    )

    area = coronary_artery.lower()
    if area == "left":
        vessels, name = LEFT_CORONARY_DOMINANCE_VESSELS, "Left Coronary Area"
    elif area == "right":
        vessels, name = RIGHT_CORONARY_DOMINANCE_VESSELS, "Right Coronary Area"
    else:
        return None
    return _plot_avg_trajectories(_load_trajectory(trajectory), vessels,
                                  name, out)


def plot_ifr_trends(
    trajectory, out: str | Path = "ifr_trends.png",
    metric_suffix: str = "ifr_mae",
):
    """Overall IFR-MAE trend across epochs (reference plot_ifr_trends
    :1824): per-epoch mean over vessels with sd error bars, a linear trend
    line, and a best/worst stats box."""
    df = _load_trajectory(trajectory)
    cols = [c for c in df.columns if c.endswith(f"/{metric_suffix}")]
    if not cols or "epoch" not in df.columns:
        return None
    vals = df[cols].to_numpy(dtype=float)
    with np.errstate(invalid="ignore"):
        means = np.nanmean(vals, axis=1)
        sds = np.where(np.sum(~np.isnan(vals), axis=1) > 1,
                       np.nanstd(vals, axis=1), 0.0)
    ok = ~np.isnan(means)
    if not ok.any():
        return None
    ep = df["epoch"].to_numpy(dtype=float)[ok]
    m, s = means[ok], sds[ok]
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.plot(ep, m, "o-", lw=2, color="tab:blue", label="IFR MAE")
    ax.errorbar(ep, m, yerr=s, fmt="none", ecolor="lightblue",
                alpha=0.7, capsize=3)
    if len(ep) > 1:
        z = np.polyfit(ep, m, 1)
        ax.plot(ep, np.poly1d(z)(ep), "--", color="orange", alpha=0.7,
                label=f"trend (slope {z[0]:+.5f}/epoch)")
    best_i, worst_i = int(np.argmin(m)), int(np.argmax(m))
    ax.text(0.02, 0.98,
            f"best {m[best_i]:.4f} (e{int(ep[best_i])})\n"
            f"worst {m[worst_i]:.4f} (e{int(ep[worst_i])})\n"
            f"mean {np.mean(m):.4f} ± {np.std(m):.4f}",
            transform=ax.transAxes, va="top", fontsize=9,
            fontfamily="monospace",
            bbox=dict(boxstyle="round,pad=0.4", fc="lightyellow", alpha=0.8))
    ax.set_xlabel("epoch")
    ax.set_ylabel("MAE")
    ax.set_title("IFR mean absolute error across epochs")
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def epoch_results_to_trajectory(results_dict: Dict) -> "object":
    """Adapt the nested epoch-analysis results ({epoch_key: {"metrics":
    {stenosis/calcification/ifr: {stat: {vessel: v}}}}}, the shape
    data/study_analysis.run_multi_epoch_study_analysis returns and the
    reference's chart functions consume) to the trajectory DataFrame the
    panel functions here take. Column naming: ``<vessel>/mae|corr``
    (stenosis), ``<vessel>/accuracy`` (calcification),
    ``<vessel>/ifr_mae|ifr_corr`` (IFR)."""
    import re as _re

    import pandas as pd

    suffix_of = {
        ("stenosis", "mae"): "mae", ("stenosis", "corr"): "corr",
        ("calcification", "accuracy"): "accuracy",
        ("ifr", "mae"): "ifr_mae", ("ifr", "corr"): "ifr_corr",
    }

    def epoch_num(key, i):
        m = _re.search(r"epoch[_-]?(\d+)", str(key))
        return int(m.group(1)) if m else i

    rows = []
    for i, key in enumerate(sorted(results_dict)):
        row = {"epoch": epoch_num(key, i)}
        metrics = results_dict[key].get("metrics", results_dict[key])
        for fam, stats in metrics.items():
            for stat, per_vessel in stats.items():
                sfx = suffix_of.get((fam, stat))
                if sfx is None:
                    continue
                for vessel, v in per_vessel.items():
                    row[f"{vessel}/{sfx}"] = v
        rows.append(row)
    return pd.DataFrame(rows).sort_values("epoch").reset_index(drop=True)
