"""Online serving daemon (scripts/serve.py): request -> micro-batched
device dispatch -> top-k texts. The reference has batch inference only
(runners/video_constrative_learning_runner.py:1731-1826); the server is the
TPU build's online counterpart, so these tests pin its contract: fixed-shape
padded dispatch, request coalescing, and the HTTP surface."""

import http.client
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import serve  # noqa: E402


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    ns = type("A", (), {})()
    ns.base_config = None
    ns.checkpoint = None
    ns.ckpt_name = "checkpoint"
    ns.text_bank = None
    ns.demo_bank = 64
    ns.host = "127.0.0.1"
    ns.port = 0  # ephemeral
    ns.max_batch = 2
    ns.batch_window_ms = 200.0  # wide window: the coalescing test relies on it
    ns.num_videos = 2
    ns.top_k = 3
    ns.tiny = True
    httpd, engine = serve.build_server(ns)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    clips = tmp_path_factory.mktemp("clips")
    r = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = clips / f"clip{i}.npy"
        np.save(p, r.integers(0, 255, size=(8, 48, 48, 3)).astype(np.uint8))
        paths.append(str(p))

    yield httpd, engine, paths
    httpd.shutdown()


def _post(port, path, payload):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    c.request("POST", path, json.dumps(payload),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    return r.status, json.loads(r.read())


def _get(port, path):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    c.request("GET", path)
    r = c.getresponse()
    return r.status, json.loads(r.read())


def test_healthz_and_stats_shape(server):
    httpd, _, _ = server
    port = httpd.server_address[1]
    assert _get(port, "/healthz") == (200, {"ok": True})
    code, stats = _get(port, "/stats")
    assert code == 200
    assert stats["max_batch"] == 2 and stats["bank_size"] == 64


def test_retrieve_topk_contract(server):
    httpd, engine, paths = server
    port = httpd.server_address[1]
    code, out = _post(port, "/retrieve", {"videos": paths})  # 3 > num_videos=2
    assert code == 200
    assert out["n_clips"] == 2  # truncated to num_videos
    assert len(out["topk"]) == 3
    scores = [t["score"] for t in out["topk"]]
    assert scores == sorted(scores, reverse=True)
    assert all(t["text"].startswith("demo report") for t in out["topk"])


def test_embed_returns_unit_norm(server):
    httpd, engine, paths = server
    port = httpd.server_address[1]
    code, out = _post(port, "/embed", {"videos": paths[:1]})
    assert code == 200
    emb = np.asarray(out["embedding"])
    assert emb.shape == (engine.cfg.embedding_dim,)
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-4


def test_concurrent_requests_coalesce_into_one_dispatch(server):
    httpd, engine, paths = server
    port = httpd.server_address[1]
    b0 = httpd.batcher.stats["batches"]
    results = [None, None]

    def hit(i):
        results[i] = _post(port, "/retrieve", {"videos": [paths[i]]})

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(r[0] == 200 for r in results)
    # both rode batches that together added 2 requests; with the 200 ms
    # window they coalesce into one dispatch unless host prep skews them
    stats = httpd.batcher.stats
    assert stats["batches"] - b0 <= 2
    assert stats["requests"] >= 2


def test_empty_request_is_400(server):
    httpd, _, _ = server
    port = httpd.server_address[1]
    code, out = _post(port, "/retrieve", {"videos": []})
    assert code == 400


def test_checkpoint_restore_serves_trained_video_tower(tmp_path):
    """--checkpoint path: the server must restore the video tower from a
    CLIP training checkpoint (full TrainState template -> video subtree)
    and produce that tower's embeddings, not random-init ones."""
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.flagship import tiny_config
    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.train.checkpoint import CheckpointManager
    from deepcoro_clip_tpu.train.clip import build_clip_bundle

    register_all()
    cfg = tiny_config(multi_video=True, num_videos=2)
    mesh = make_mesh(MeshSpec(data=1, model=1))
    _, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(7),
                                 steps_per_epoch=1)
    ckpt_dir = tmp_path / "checkpoints"
    CheckpointManager(ckpt_dir).save_latest(state, {"epoch": 0})

    ns = type("A", (), {})()
    ns.base_config = None
    ns.checkpoint = str(ckpt_dir)
    ns.ckpt_name = "checkpoint"
    ns.text_bank = None
    ns.demo_bank = 16
    ns.host = "127.0.0.1"
    ns.port = 0
    ns.max_batch = 1
    ns.batch_window_ms = 1.0
    ns.num_videos = 2
    ns.top_k = 3
    ns.tiny = True
    httpd, engine = serve.build_server(ns)
    try:
        # the engine's params are the checkpoint's video tower, bit-exact
        saved = state.params["video_encoder"]
        got_leaves = jax.tree_util.tree_leaves(engine.params)
        want_leaves = jax.tree_util.tree_leaves(saved)
        assert len(got_leaves) == len(want_leaves)
        for g, w in zip(got_leaves, want_leaves):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

        # and it actually serves with them
        r = np.random.default_rng(1)
        clip = tmp_path / "c.npy"
        np.save(clip, r.integers(0, 255, size=(6, 40, 40, 3)).astype(np.uint8))
        study, mask = engine.load_study([str(clip)])
        emb, scores, idx = engine.infer_batch(study[None], mask[None])
        assert np.isfinite(emb).all() and idx.shape == (1, 3)
    finally:
        httpd.server_close()


def test_padded_batch_matches_unpadded_single(server):
    """The fixed-shape pad must not change a real study's embedding."""
    _, engine, paths = server
    study, mask = engine.load_study(paths[:2])
    emb1, _, _ = engine.infer_batch(study[None], mask[None])  # padded to 2
    both = np.stack([study, study])
    masks = np.stack([mask, mask])
    emb2, _, _ = engine.infer_batch(both, masks)
    np.testing.assert_allclose(emb1[0], emb2[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(emb2[0], emb2[1], rtol=2e-5, atol=2e-5)

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
