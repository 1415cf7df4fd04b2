"""End-to-end mono-wire training: grayscale-replicated clips through the
real CLI/runner with config.mono_wire — the loader ships 1-channel uint8,
the device folds the replication into the patchify weights
(models/layers._PatchProj), and training/validation run unchanged."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

from deepcoro_clip_tpu.registry import register_all

register_all()


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("mono_ws")
    r = np.random.default_rng(7)
    rows = []
    for i in range(8):
        p = root / f"clip{i}.npy"
        luma = r.integers(0, 255, size=(8, 32, 32, 1)).astype(np.uint8)
        np.save(p, np.repeat(luma, 3, axis=-1))  # grayscale-replicated RGB
        rows.append({
            "FileName": str(p),
            "Report": f"mid lad stenosis {i % 2} report",
            "StudyInstanceUID": f"S{i}",
            "Split": "train" if i < 6 else "val",
        })
    csv = root / "data.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)
    cfg = dict(
        pipeline_project="DeepCORO_clip",
        run_mode="train",
        data_filename=str(csv),
        output_dir=str(root / "outputs"),
        epochs=1, batch_size=4, frames=4, resize=32, num_workers=0,
        multi_video=False,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=512,
        max_text_length=16, embedding_dim=16, num_heads=2, aggregator_depth=1,
        dropout=0.0, lr=1e-3, precision="fp32", use_pallas_attention=False,
        use_wandb=False, recall_k=[1], ndcg_k=[1],
        mesh_data=-1, mesh_model=1, seed=0,
        wire_dtype="uint8", mono_wire=True,
    )
    cfg_path = root / "config.yaml"
    yaml.safe_dump(cfg, cfg_path.open("w"))
    return root, cfg_path


def test_mono_wire_trains_end_to_end(workspace):
    from deepcoro_clip_tpu.main import main

    root, cfg_path = workspace
    result = main(["--base_config", str(cfg_path)])
    assert len(result["history"]) == 1
    assert np.isfinite(result["history"][0]["loss"])
    assert "val_Recall@1" in result["history"][-1]
    # stats were computed from the mono dataset: channel-uniform, len 1 or 3
    run_dirs = list((root / "outputs").rglob("config.yaml"))
    assert run_dirs, "resolved config backup missing"
    resolved = yaml.safe_load(run_dirs[-1].read_text())
    assert resolved["mono_wire"] is True

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
