"""Patch-major wire: host space-to-depth == device space-to-depth.

The wire moves ONLY layout to the host (data/patch_wire.py +
native/fastvideo.cpp::fv_space_to_depth); the patchify matmul, stats fold,
and everything downstream are unchanged — so the encoder must produce the
same embeddings for the same pixels on either wire.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.data import patch_wire
from deepcoro_clip_tpu.models.video_encoder import (
    VideoEncoder,
    video_encoder_from_config,
)

PATCH = (2, 8, 8)
B, N, T, H, W = 2, 2, 4, 16, 24
GRID = (T // PATCH[0], H // PATCH[1], W // PATCH[2])


def _encoder(**over):
    kw = dict(
        embedding_dim=32, backbone_dim=48, depth=2, backbone_heads=2,
        patch=PATCH, num_heads=2, aggregator_depth=1, dropout=0.0,
        dtype=jnp.float32, use_flash=False, patch_grid=GRID,
        pixel_mean=(90.0, 100.0, 110.0), pixel_std=(40.0, 41.0, 42.0),
    )
    kw.update(over)
    return VideoEncoder(**kw)


def _videos():
    r = np.random.default_rng(0)
    return r.integers(0, 255, size=(B, N, T, H, W, 3)).astype(np.uint8)


def test_oracle_native_agree():
    vids = _videos()
    ora = np.stack([
        np.stack([patch_wire.space_to_depth(c, PATCH) for c in s])
        for s in vids
    ])
    got = patch_wire.patchify_videos(vids, PATCH)
    assert got.shape == (B, N, GRID[0] * GRID[1] * GRID[2],
                         PATCH[0] * PATCH[1] * PATCH[2] * 3)
    np.testing.assert_array_equal(got, ora)


def test_depth_to_space_roundtrip():
    vids = _videos()
    toks = patch_wire.patchify_videos(vids, PATCH)
    rec = patch_wire.depth_to_space(toks[1, 0], GRID, PATCH)
    np.testing.assert_array_equal(rec, vids[1, 0])


@pytest.mark.parametrize("mode", ["study", "tokens"])
def test_wire_equivalence_uint8(mode):
    """Same uint8 pixels -> same embeddings on both wires (stats folded)."""
    model = _encoder(aggregate_videos_tokens=(mode == "study"))
    vids = _videos()
    patched = patch_wire.patchify_videos(vids, PATCH)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(vids),
    )
    a = model.apply(params, jnp.asarray(vids), deterministic=True)
    b = model.apply(params, jnp.asarray(patched), deterministic=True)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_wire_equivalence_single_video_axis():
    """[B, L, K] (no video axis) matches [B, T, H, W, C]."""
    model = _encoder()
    vids = _videos()[:, 0]  # [B, T, H, W, C]
    patched = patch_wire.patchify_videos(vids, PATCH)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(vids),
    )
    a = model.apply(params, jnp.asarray(vids), deterministic=True)
    b = model.apply(params, jnp.asarray(patched), deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_grad_parity_between_wires():
    """Parameter gradients agree across wires (training-path equivalence)."""
    model = _encoder()
    vids = _videos()
    patched = patch_wire.patchify_videos(vids, PATCH)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(vids),
    )

    def loss(p, x):
        return jnp.sum(model.apply(p, x, deterministic=True) ** 2)

    ga = jax.grad(loss)(params, jnp.asarray(vids))
    gb = jax.grad(loss)(params, jnp.asarray(patched))
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=5e-4, atol=5e-4)


def test_from_config_sets_grid():
    from deepcoro_clip_tpu.flagship import flagship_config

    cfg = flagship_config()
    enc = video_encoder_from_config(cfg)
    pt, ph, pw = enc.patch
    assert enc.patch_grid == (cfg.frames // pt, cfg.resize // ph,
                              cfg.resize // pw)


def test_runner_trains_on_patch_wire(tmp_path):
    """config.patch_wire drives the real runner end-to-end: the collate
    emits [B, N, L, K] uint8 and training + retrieval validation complete."""
    import pandas as pd
    import yaml

    from deepcoro_clip_tpu.registry import register_all

    register_all()
    r = np.random.default_rng(0)
    rows = []
    for i in range(8):
        p = tmp_path / f"clip{i}.npy"
        np.save(p, r.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8))
        rows.append({
            "FileName": str(p),
            "Report": f"left main stenosis {i % 3} severity report",
            "StudyInstanceUID": f"S{i}",
            "Split": "train" if i < 6 else "val",
        })
    csv = tmp_path / "data.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)
    cfg = dict(
        pipeline_project="DeepCORO_clip", run_mode="train",
        data_filename=str(csv), output_dir=str(tmp_path / "outputs"),
        epochs=1, batch_size=4, frames=4, resize=32, num_workers=1,
        multi_video=False, patch_wire=True,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        text_dim=32, text_depth=1, text_heads=2, text_vocab_size=512,
        max_text_length=16, embedding_dim=16, num_heads=2,
        aggregator_depth=1, dropout=0.0, lr=1e-3, precision="fp32",
        use_pallas_attention=False, use_wandb=False, recall_k=[1],
        ndcg_k=[1], mesh_data=-1, mesh_model=1, seed=0,
    )
    cfg_path = tmp_path / "config.yaml"
    yaml.safe_dump(cfg, cfg_path.open("w"))

    from deepcoro_clip_tpu.main import main

    result = main(["--base_config", str(cfg_path)])
    assert result is not None
    metrics = (tmp_path / "outputs").rglob("metrics.jsonl")
    lines = [l for mj in metrics for l in mj.read_text().splitlines()]
    assert any("train/loss" in l for l in lines)

    # the collate really produced the patch-major wire
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.data.collate import collate_clip, wire_patch
    from deepcoro_clip_tpu.data.tokenizer import get_tokenizer

    config = parse_config(["--base_config", str(cfg_path)])
    patch = wire_patch(config)
    assert patch == (2, 16, 16)
    items = [{"videos": r.integers(0, 255, size=(1, 4, 32, 32, 3))
              .astype(np.uint8),
              "video_mask": np.ones((1,), bool), "text": "t", "paths": []}]
    b = collate_clip(items, get_tokenizer(vocab_size=512, max_length=16),
                     max_text_length=16, patch=patch)
    assert b["videos"].shape == (1, 1, 2 * 2 * 2, 2 * 16 * 16 * 3)


def test_missing_grid_raises():
    model = _encoder(patch_grid=None)
    vids = _videos()
    patched = patch_wire.patchify_videos(vids, PATCH)
    with pytest.raises(ValueError, match="patch_grid"):
        model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)},
            jnp.asarray(patched),
        )

# multi-second jit-compile tests on the CPU harness: fast-path
# excluded (pass --runslow)
pytestmark = pytest.mark.slow
