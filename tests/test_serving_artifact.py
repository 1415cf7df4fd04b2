"""Frozen serving artifacts (deepcoro_clip_tpu/serving.py): the compiled
retrieval program is the deployable — exported with jax.export, replayed
with only jax + numpy. The reference redeploys Python model code + torch
checkpoint instead (scripts/external_validation.py:710-960); these tests
pin the TPU build's counterpart: byte-roundtrip, numerical identity with
the in-process model, fixed-shape padding, param hot-swap, and the HTTP
server running straight off an artifact directory."""

import http.client
import json
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.flagship import tiny_config
from deepcoro_clip_tpu.registry import register_all
from deepcoro_clip_tpu.serving import (
    BANK_FILE,
    META_FILE,
    PARAMS_FILE,
    PROGRAM_FILE,
    RetrievalArtifact,
    _retrieval_fn,
    export_retrieval_artifact,
)

register_all()

BANK_SIZE, MAX_BATCH, TOP_K, NUM_VIDEOS = 16, 2, 3, 2


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = tiny_config(multi_video=True, num_videos=NUM_VIDEOS)
    r = np.random.default_rng(0)
    bank = r.normal(size=(BANK_SIZE, cfg.embedding_dim))
    out = tmp_path_factory.mktemp("artifact")
    meta = export_retrieval_artifact(
        cfg, out, bank, [f"report {i}" for i in range(BANK_SIZE)],
        max_batch=MAX_BATCH, top_k=TOP_K,
    )
    return cfg, out, meta


def _random_studies(meta, b, seed=1):
    r = np.random.default_rng(seed)
    st = r.integers(
        0, 256,
        (b, meta["num_videos"], meta["tokens_per_clip"], meta["patch_bytes"]),
        dtype=np.uint8,
    )
    return st, np.ones((b, meta["num_videos"]), bool)


def test_artifact_layout_and_meta(artifact):
    cfg, out, meta = artifact
    for f in (PROGRAM_FILE, PARAMS_FILE, BANK_FILE, META_FILE):
        assert (out / f).stat().st_size > 0
    assert meta["wire"] == "patch_u8"
    assert meta["max_batch"] == MAX_BATCH and meta["top_k"] == TOP_K
    assert meta["embedding_dim"] == cfg.embedding_dim
    assert jax.default_backend() in meta["platforms"]
    pt, ph, pw = meta["patch"]
    assert meta["patch_bytes"] == pt * ph * pw * 3
    gt, gh, gw = meta["patch_grid"]
    assert meta["tokens_per_clip"] == gt * gh * gw


def test_roundtrip_matches_inprocess_model(artifact):
    """Deserialized program == live jit of the same fn on the same params."""
    from deepcoro_clip_tpu.models.video_encoder import (
        video_encoder_from_config,
    )

    cfg, out, meta = artifact
    art = RetrievalArtifact(out)
    studies, mask = _random_studies(meta, MAX_BATCH)
    emb_a, sc_a, idx_a = art.infer_batch(studies, mask)

    model = video_encoder_from_config(cfg)
    fn = jax.jit(_retrieval_fn(model, meta["top_k"]))
    emb_b, sc_b, idx_b = fn(art._params, art._bank,
                            jnp.asarray(studies), jnp.asarray(mask))
    np.testing.assert_allclose(emb_a, np.asarray(emb_b), atol=1e-5)
    np.testing.assert_allclose(sc_a, np.asarray(sc_b), atol=1e-5)
    assert np.array_equal(idx_a, np.asarray(idx_b))


def test_short_batch_pads_to_compiled_shape(artifact):
    _, out, meta = artifact
    art = RetrievalArtifact(out)
    studies, mask = _random_studies(meta, MAX_BATCH)
    full = art.infer_batch(studies, mask)
    solo = art.infer_batch(studies[:1], mask[:1])
    for a, b in zip(solo, full):
        assert a.shape[0] == 1
        np.testing.assert_allclose(a, b[:1], atol=1e-5)
    with pytest.raises(ValueError, match="max_batch"):
        big, bm = _random_studies(meta, MAX_BATCH + 1)
        art.infer_batch(big, bm)


def test_swap_params_changes_outputs(artifact):
    """A same-shape fine-tuned tower drops in without re-export."""
    from deepcoro_clip_tpu.models.video_encoder import (
        video_encoder_from_config,
    )

    cfg, out, meta = artifact
    art = RetrievalArtifact(out)
    studies, mask = _random_studies(meta, 1)
    emb0 = art.infer_batch(studies, mask)[0]

    model = video_encoder_from_config(cfg)
    rng = jax.random.PRNGKey(7)
    fresh = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, meta["num_videos"], meta["tokens_per_clip"],
                   meta["patch_bytes"]), jnp.uint8),
        video_mask=jnp.ones((1, meta["num_videos"]), bool),
    )["params"]
    art.swap_params(fresh)
    emb1 = art.infer_batch(studies, mask)[0]
    assert np.max(np.abs(emb0 - emb1)) > 1e-3  # different tower, different emb

    # swapping the original params back restores the original outputs
    from flax import serialization

    orig = serialization.msgpack_restore((out / PARAMS_FILE).read_bytes())
    art._params = jax.device_put(orig)
    emb2 = art.infer_batch(studies, mask)[0]
    np.testing.assert_allclose(emb0, emb2, atol=1e-6)


def test_platform_guard(artifact, tmp_path):
    """An artifact exported for another platform refuses to load."""
    import shutil

    _, out, meta = artifact
    alien = tmp_path / "alien"
    shutil.copytree(out, alien)
    m = json.loads((alien / META_FILE).read_text())
    m["platforms"] = ["tpu"] if jax.default_backend() != "tpu" else ["cpu"]
    (alien / META_FILE).write_text(json.dumps(m))
    with pytest.raises(ValueError, match="exported for"):
        RetrievalArtifact(alien)


def test_export_model_cli_verify(artifact, tmp_path, capsys):
    """The CLI's export -> verify path agrees end-to-end."""
    import export_model

    out = tmp_path / "cli_art"
    export_model.main([
        "export", "--out", str(out), "--tiny",
        "--num_videos", str(NUM_VIDEOS), "--max_batch", str(MAX_BATCH),
        "--top_k", str(TOP_K), "--demo_bank", str(BANK_SIZE),
    ])
    export_model.main([
        "verify", "--artifact", str(out), "--tiny",
        "--num_videos", str(NUM_VIDEOS),
    ])
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last)["ok"] is True


@pytest.fixture(scope="module")
def probe_artifact(tmp_path_factory):
    """Tiny linear-probing pipeline frozen through the same machinery."""
    import yaml

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.serving import export_probing_artifact

    cfg_path = tmp_path_factory.mktemp("probe_cfg") / "cfg.yaml"
    yaml.safe_dump(dict(
        pipeline_project="DeepCORO_video_linear_probing",
        run_mode="train", data_filename="unused.csv", output_dir="unused",
        frames=4, resize=32, multi_video=True, num_videos=NUM_VIDEOS,
        head_structure={"stenosis": 1, "cto": 1, "vessel": 3},
        loss_structure={"stenosis": "huber", "cto": "bce_logit",
                        "vessel": "ce"},
        head_task={"stenosis": "regression", "cto": "binary",
                   "vessel": "multiclass"},
        pooling_mode="attention+cls_token",
        use_view_embeddings=True, view_column="view_id", num_view_classes=3,
        vit_dim=32, vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16],
        embedding_dim=16, num_heads=2, aggregator_depth=1,
        attention_hidden=8, dropout=0.0,
        precision="fp32", use_pallas_attention=False, use_wandb=False,
    ), cfg_path.open("w"))
    cfg = parse_config(["--base_config", str(cfg_path)])
    out = tmp_path_factory.mktemp("probe_art")
    meta = export_probing_artifact(cfg, out, max_batch=MAX_BATCH)
    return cfg, cfg_path, out, meta


def test_probing_artifact_matches_inprocess(probe_artifact):
    from deepcoro_clip_tpu.models.video_encoder import (
        video_encoder_from_config,
    )
    from deepcoro_clip_tpu.serving import ProbingArtifact, _probing_fn
    from deepcoro_clip_tpu.train.linear_probe import _mil_from_config

    cfg, _, out, meta = probe_artifact
    assert meta["kind"] == "probing" and meta["has_view_ids"]
    art = ProbingArtifact(out)
    studies, mask = _random_studies(meta, MAX_BATCH)
    vid = np.arange(MAX_BATCH * NUM_VIDEOS, dtype=np.int32).reshape(
        MAX_BATCH, NUM_VIDEOS) % 3
    out_a = art.infer_batch(studies, mask, vid)
    assert sorted(out_a) == ["cto", "stenosis", "vessel"]
    assert out_a["vessel"].shape == (MAX_BATCH, 3)

    video_model = video_encoder_from_config(cfg, aggregate=False,
                                            per_video=True)
    fn = jax.jit(_probing_fn(video_model, _mil_from_config(cfg),
                             False, True))
    out_b = fn(art._params, jnp.asarray(studies), jnp.asarray(mask),
               jnp.asarray(vid))
    for h in out_a:
        np.testing.assert_allclose(out_a[h], np.asarray(out_b[h]), atol=1e-5)


def test_probing_predict_applies_head_activations(probe_artifact):
    from deepcoro_clip_tpu.serving import ProbingArtifact

    _, _, out, meta = probe_artifact
    art = ProbingArtifact(out)
    studies, mask = _random_studies(meta, 1)
    logits = art.infer_batch(studies, mask)
    probs = art.predict(studies, mask)
    assert np.all((probs["cto"] > 0) & (probs["cto"] < 1))  # sigmoid
    np.testing.assert_allclose(probs["vessel"].sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(probs["stenosis"], logits["stenosis"])  # identity


def test_probing_cli_export_and_verify(probe_artifact, tmp_path, capsys):
    import export_model

    _, cfg_path, _, _ = probe_artifact
    out = tmp_path / "probe_cli"
    export_model.main([
        "export-probe", "--out", str(out), "--base_config", str(cfg_path),
        "--max_batch", str(MAX_BATCH),
    ])
    export_model.main([
        "verify", "--artifact", str(out), "--base_config", str(cfg_path),
    ])
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last)["ok"] is True


def test_kind_guard(artifact, probe_artifact):
    """Each loader refuses the other kind's directory."""
    from deepcoro_clip_tpu.serving import ProbingArtifact

    _, retr_dir, _ = artifact
    _, _, probe_dir, _ = probe_artifact
    with pytest.raises(ValueError, match="kind"):
        ProbingArtifact(retr_dir)
    with pytest.raises(ValueError, match="kind"):
        RetrievalArtifact(probe_dir)


def test_serve_from_artifact(artifact, tmp_path):
    """scripts/serve.py --artifact: the HTTP server runs off the frozen
    program with no model assembly."""
    import serve

    _, out, _ = artifact
    ns = type("A", (), {})()
    ns.artifact = str(out)
    ns.host, ns.port = "127.0.0.1", 0
    ns.batch_window_ms = 5.0
    httpd, engine = serve.build_server(ns)
    assert isinstance(engine, RetrievalArtifact)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        r = np.random.default_rng(0)
        p = tmp_path / "clip.npy"
        np.save(p, r.integers(0, 255, size=(8, 48, 48, 3)).astype(np.uint8))
        c = http.client.HTTPConnection(
            "127.0.0.1", httpd.server_address[1], timeout=120)
        c.request("POST", "/retrieve", json.dumps({"videos": [str(p)]}),
                  {"Content-Type": "application/json"})
        resp = c.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 200
        assert len(body["topk"]) == TOP_K
        scores = [x["score"] for x in body["topk"]]
        assert scores == sorted(scores, reverse=True)
    finally:
        httpd.shutdown()

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
