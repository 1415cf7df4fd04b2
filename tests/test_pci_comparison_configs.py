"""Shipped PCI_comparison config family (VERDICT r4 missing #6).

Reference: config/linear_probing/PCI_comparison/config_{pre,post}_pci_
{embedding,inference}.yaml — frozen-backbone, headless study-embedding
extraction where ``split_filter`` selects the diagnostic (pre-PCI) vs
POST_PCI rows of one manifest. The e2e test drives BOTH shipped embedding
configs through the real LinearProbingRunner at tiny size and feeds the
resulting NPZ pair to scripts/analyze_pci_embeddings.py.
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

from deepcoro_clip_tpu.configs.parser import parse_config
from deepcoro_clip_tpu.registry import register_all

register_all()

REPO = Path(__file__).resolve().parents[1]
PCI_DIR = REPO / "config" / "linear_probing" / "pci_comparison"
ALL_FOUR = sorted(PCI_DIR.glob("*.yaml"))


def test_family_ships_all_four_roles():
    assert [p.name for p in ALL_FOUR] == [
        "post_pci_embedding.yaml", "post_pci_inference.yaml",
        "pre_pci_embedding.yaml", "pre_pci_inference.yaml",
    ]


@pytest.mark.parametrize("path", ALL_FOUR, ids=lambda p: p.stem)
def test_parses_through_config_stack(path):
    cfg = parse_config(["--base_config", str(path)])
    assert cfg.run_mode == "inference"
    assert cfg.save_embeddings and cfg.video_freeze_ratio == 1.0
    assert cfg.head_structure == {}
    assert cfg.embedding_output_file.endswith("_study_embeddings.npz")
    if "embedding" in path.stem:
        assert cfg.split_filter == (
            "diagnostic" if "pre" in path.stem else "POST_PCI")


@pytest.mark.slow
def test_pre_post_extraction_and_shift_analysis(tmp_path):
    r = np.random.default_rng(0)
    rows = []
    for s in range(4):
        for phase, split in (("pre", "diagnostic"), ("post", "POST_PCI")):
            for c in range(2):
                p = tmp_path / f"{phase}_s{s}_c{c}.npy"
                np.save(p, r.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8))
                rows.append({
                    "FileName": str(p),
                    "StudyInstanceUID": f"S{s}",
                    "Split": split,
                })
    csv = tmp_path / "manifest.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)

    from deepcoro_clip_tpu.runners.linear_probing import LinearProbingRunner

    tiny = [
        "--data_filename", str(csv),
        "--frames", "4", "--resize", "32", "--batch_size", "2",
        "--vit_dim", "32", "--vit_depth", "1", "--vit_heads", "1",
        "--vit_pool_stages", "[]",
        "--embedding_dim", "16", "--num_heads", "2",
        "--aggregator_depth", "1", "--attention_hidden", "8",
        "--precision", "fp32", "--use_pallas_attention", "false",
        "--num_videos", "2", "--num_workers", "2",
        "--dataset_mean", "110.0", "--dataset_std", "40.0",
    ]
    npz = {}
    for phase in ("pre", "post"):
        cfg = parse_config(
            ["--base_config", str(PCI_DIR / f"{phase}_pci_embedding.yaml")]
            + tiny + ["--output_dir", str(tmp_path / phase)])
        runner = LinearProbingRunner(cfg, output_dir=str(tmp_path / phase))
        df = runner.inference()
        assert sorted(df["study_id"]) == [f"S{s}" for s in range(4)]
        path = (tmp_path / phase / "inference"
                / f"{phase}_pci_study_embeddings.npz")
        assert path.exists(), "embedding_output_file name must be honored"
        npz[phase] = path
        arch = np.load(path, allow_pickle=True)
        # MIL pooled embeddings live at ENCODER width (vit_dim)
        assert arch["embeddings"].shape == (4, 32)

    status = tmp_path / "status.csv"
    pd.DataFrame({
        "StudyInstanceUID": [f"S{s}" for s in range(4)],
        "pci_performed": [1, 1, 0, 0],
    }).to_csv(status, index=False)

    spec = importlib.util.spec_from_file_location(
        "pci_analysis", REPO / "scripts" / "analyze_pci_embeddings.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.analyze(str(npz["pre"]), str(npz["post"]), str(status),
                      tmp_path / "analysis", n_bootstrap=50)
    assert res["n_pci"] == 2 and res["n_no_pci"] == 2
    assert "permutation_p" in res
    assert (tmp_path / "analysis" / "summary.json").exists()
    assert (tmp_path / "analysis" / "pci_embedding_shift.csv").exists()
