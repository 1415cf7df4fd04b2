"""Retrieval-inference pipeline: text bank + metadata -> top-k averaged
metadata CSV (reference: runners/video_constrative_learning_runner.py:
1731-1826), plus the generate_embeddings flow feeding it."""

import numpy as np
import pandas as pd
import pytest
import yaml

from deepcoro_clip_tpu.registry import register_all

register_all()


@pytest.fixture(scope="module")
def trained_runner(tmp_path_factory):
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.runners.contrastive import VideoContrastiveLearningRunner

    root = tmp_path_factory.mktemp("inf")
    r = np.random.default_rng(0)
    rows = []
    for i in range(6):
        p = root / f"c{i}.npy"
        np.save(p, r.integers(0, 255, size=(6, 32, 32, 3)).astype(np.uint8))
        rows.append({"FileName": str(p), "StudyInstanceUID": f"S{i}",
                     "Split": "inference", "Report": f"report {i}"})
    csv = root / "d.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)

    cfg_d = dict(
        pipeline_project="DeepCORO_clip", run_mode="inference",
        data_filename=str(csv), output_dir=str(root / "out"),
        batch_size=4, frames=4, resize=32, num_workers=1,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=512,
        max_text_length=16, embedding_dim=16, num_heads=2, aggregator_depth=1,
        dropout=0.0, precision="fp32", use_pallas_attention=False,
        use_wandb=False, seed=0, topk=3,
        dataset_mean=[127.0] * 3, dataset_std=[50.0] * 3,
        inference_results_path=str(root / "infres"),
    )
    # text bank: 10 texts with numeric + string metadata
    bank = r.normal(size=(10, 16)).astype(np.float32)
    np.savez(root / "bank.npz", text_embeddings=bank)
    meta = pd.DataFrame({
        "stenosis_pct": np.arange(10) * 10.0,
        "vessel": ["lad"] * 5 + ["rca"] * 5,
    })
    meta.to_csv(root / "meta.csv", index=False)
    cfg_d["text_embeddings_path"] = str(root / "bank.npz")
    cfg_d["metadata_path"] = str(root / "meta.csv")

    p = root / "cfg.yaml"
    yaml.safe_dump(cfg_d, p.open("w"))
    cfg = parse_config(["--base_config", str(p)])
    runner = VideoContrastiveLearningRunner(cfg, output_dir=root / "run")
    return root, runner


def test_inference_topk_metadata(trained_runner):
    root, runner = trained_runner
    df = runner.inference()
    assert len(df) == 6
    # numeric metadata averaged over top-3, string metadata is the mode
    assert "stenosis_pct" in df.columns and "vessel" in df.columns
    assert df["vessel"].isin(["lad", "rca"]).all()
    assert all(len(ix) == 3 for ix in df["topk_indices"])
    out_csv = root / "infres" / "averaged_metadata.csv"
    assert out_csv.exists()
    # averaged numeric value must lie within the bank's range
    assert df["stenosis_pct"].between(0, 90).all()


def test_encode_texts_batches(trained_runner):
    """Unique-text re-encode in fixed 64-size batches (reference :904-941):
    results must be identical regardless of internal batching."""
    _, runner = trained_runner
    texts = [f"text {i}" for i in range(70)]  # spans 2 batches
    e1 = runner._encode_texts(texts, batch_size=64)
    e2 = runner._encode_texts(texts, batch_size=16)
    assert e1.shape == (70, 16)
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-5)

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
