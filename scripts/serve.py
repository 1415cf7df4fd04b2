"""Micro-batching HTTP inference server for per-study retrieval.

The reference ships batch inference only (runner ``--run_mode inference``,
runners/video_constrative_learning_runner.py:1731-1826, and the Docker
external-validation pipeline); this is the online-serving counterpart for
the TPU build. The design is shaped by two TPU facts:

- XLA programs are compiled for STATIC shapes: the server always dispatches
  a fixed ``[max_batch, num_videos, ...]`` study tensor (short batches are
  zero-padded and masked), so exactly one compiled program serves every
  request mix.
- Per-dispatch host->device latency dominates small inferences (~100 ms
  through this environment's tunnel; ~10 us on a real host), so concurrent
  requests are COALESCED: the batcher collects up to ``--max_batch`` studies
  inside a ``--batch_window_ms`` window and answers them with one dispatch.

Request path per study: decode/sample/resize on the host (native fastvideo,
uint8), space-to-depth to the patch-major wire (data/patch_wire.py) in the
request thread, then the batcher's single jitted call: study embeddings ->
L2 normalize -> similarity against a precomputed text bank -> top-k.

Endpoints:
  POST /retrieve  {"videos": ["/path/a.npy", ...]}          -> top-k texts
  POST /embed     {"videos": [...]}                          -> study embedding
  GET  /healthz                                              -> liveness
  GET  /stats                                                -> batching/latency stats

Usage:
  python scripts/serve.py --text_bank bank.npz [--checkpoint ckpts/]
      [--base_config cfg.yaml] [--port 8080] [--max_batch 4]
      [--batch_window_ms 10] [--num_videos 10] [--top_k 5]

``bank.npz`` comes from scripts/generate_embeddings.py (fields
``text_embeddings`` [M,D] + ``texts`` [M]). Without ``--checkpoint`` the
model runs with random init (wire/latency smoke only).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# ---------------------------------------------------------------------------
# model assembly


class InferenceEngine:
    """Video tower + text bank + the one jitted retrieval program."""

    def __init__(self, cfg, bank_emb: np.ndarray, bank_texts,
                 max_batch: int, top_k: int,
                 video_params=None):
        import jax
        import jax.numpy as jnp

        from deepcoro_clip_tpu.models.video_encoder import (
            resolve_architecture,
            video_encoder_from_config,
        )

        self.cfg = cfg
        self.max_batch = int(max_batch)
        self.top_k = int(top_k)
        self.num_videos = int(cfg.num_videos)
        self.patch = tuple(resolve_architecture(cfg)["vit_patch"])
        self.bank_texts = list(map(str, bank_texts))

        self.model = video_encoder_from_config(cfg)
        if video_params is None:
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros(
                (1, self.num_videos, cfg.frames, cfg.resize, cfg.resize, 3),
                jnp.float32,
            )
            video_params = self.model.init(
                {"params": rng, "dropout": rng}, dummy,
                video_mask=jnp.ones((1, self.num_videos), bool),
            )["params"]
        self.params = video_params

        bank = np.asarray(bank_emb, np.float32)
        bank /= np.maximum(np.linalg.norm(bank, axis=1, keepdims=True), 1e-8)
        bank_dev = jnp.asarray(bank)
        k = min(self.top_k, bank.shape[0])

        model = self.model

        @jax.jit
        def _infer(params, studies, mask):
            emb = model.apply(
                {"params": params}, studies, video_mask=mask,
                deterministic=True,
            ).astype(jnp.float32)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-8
            )
            scores, idx = jax.lax.top_k(emb @ bank_dev.T, k)
            return emb, scores, idx

        self._infer = _infer
        self._block = jax.block_until_ready

    # -- host side ---------------------------------------------------------

    def load_study(self, paths) -> tuple[np.ndarray, np.ndarray]:
        """Paths -> ([num_videos, L, K] uint8 patch-major, [num_videos] mask).

        Short studies are zero-padded + masked; long ones keep the first
        ``num_videos`` clips (the reference dataset samples/truncates to
        ``num_videos`` the same way, dataloaders/video_clip_dataset.py:597-646).
        """
        from deepcoro_clip_tpu.data.patch_wire import patchify_videos
        from deepcoro_clip_tpu.data.video_io import load_video

        cfg, N = self.cfg, self.num_videos
        paths = list(paths)[:N]
        clips = np.zeros(
            (1, N, cfg.frames, cfg.resize, cfg.resize, 3), np.uint8
        )
        mask = np.zeros((N,), bool)
        for i, p in enumerate(paths):
            clips[0, i] = load_video(
                str(p), n_frames=cfg.frames, resize=cfg.resize,
                output_dtype="uint8",
            )
            mask[i] = True
        return patchify_videos(clips, self.patch)[0], mask

    def infer_batch(self, studies: np.ndarray, masks: np.ndarray):
        """[B<=max_batch, N, L, K] -> (emb [B,D], scores [B,k], idx [B,k]).

        Pads to the compiled ``max_batch`` shape; fully-masked pad studies
        ride the aggregator's masked-softmax fallback.
        """
        import jax.numpy as jnp

        b = studies.shape[0]
        if b < self.max_batch:
            pad = self.max_batch - b
            studies = np.concatenate(
                [studies, np.zeros((pad,) + studies.shape[1:], studies.dtype)]
            )
            masks = np.concatenate([masks, np.zeros((pad,) + masks.shape[1:], bool)])
        emb, scores, idx = self._infer(
            self.params, jnp.asarray(studies), jnp.asarray(masks)
        )
        self._block(idx)
        return (np.asarray(emb)[:b], np.asarray(scores)[:b],
                np.asarray(idx)[:b])


# ---------------------------------------------------------------------------
# micro-batcher


class MicroBatcher:
    """Coalesces concurrent studies into one fixed-shape device dispatch."""

    def __init__(self, engine: InferenceEngine, window_ms: float = 10.0):
        self.engine = engine
        self.window = window_ms / 1e3
        self._lock = threading.Condition()
        self._queue: list[dict] = []
        self.stats = {"requests": 0, "batches": 0, "occupancy_sum": 0,
                      "latencies_ms": []}
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, study: np.ndarray, mask: np.ndarray) -> dict:
        item = {"study": study, "mask": mask, "done": threading.Event()}
        with self._lock:
            self._queue.append(item)
            self.stats["requests"] += 1
            self._lock.notify()
        item["done"].wait()
        if "error" in item:
            raise RuntimeError(item["error"])
        return item

    def _run(self) -> None:
        B = self.engine.max_batch
        while True:
            with self._lock:
                while not self._queue:
                    self._lock.wait()
                deadline = time.perf_counter() + self.window
                while len(self._queue) < B:
                    left = deadline - time.perf_counter()
                    if left <= 0 or not self._lock.wait(timeout=left):
                        break
                batch, self._queue = self._queue[:B], self._queue[B:]
            t0 = time.perf_counter()
            try:
                emb, scores, idx = self.engine.infer_batch(
                    np.stack([it["study"] for it in batch]),
                    np.stack([it["mask"] for it in batch]),
                )
                for i, it in enumerate(batch):
                    it["emb"], it["scores"], it["idx"] = (
                        emb[i], scores[i], idx[i])
            except Exception as e:  # surface to every waiter, keep serving
                for it in batch:
                    it["error"] = f"{type(e).__name__}: {e}"
            dt_ms = (time.perf_counter() - t0) * 1e3
            self.stats["batches"] += 1
            self.stats["occupancy_sum"] += len(batch)
            self.stats["latencies_ms"].append(dt_ms)
            del self.stats["latencies_ms"][:-1000]  # bounded window
            for it in batch:
                it["done"].set()


# ---------------------------------------------------------------------------
# HTTP layer


def make_handler(engine: InferenceEngine, batcher: MicroBatcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; /stats carries the numbers
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                s = batcher.stats
                lat = sorted(s["latencies_ms"])
                self._json(200, {
                    "requests": s["requests"],
                    "batches": s["batches"],
                    "avg_occupancy": round(
                        s["occupancy_sum"] / max(1, s["batches"]), 3),
                    "dispatch_p50_ms": round(
                        lat[len(lat) // 2], 2) if lat else None,
                    "max_batch": engine.max_batch,
                    "num_videos": engine.num_videos,
                    "bank_size": len(engine.bank_texts),
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self) -> None:
            if self.path not in ("/retrieve", "/embed"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                paths = req.get("videos") or []
                if not paths:
                    self._json(400, {"error": "no videos given"})
                    return
                t0 = time.perf_counter()
                study, mask = engine.load_study(paths)
                item = batcher.submit(study, mask)
                ms = round((time.perf_counter() - t0) * 1e3, 2)
                if self.path == "/embed":
                    self._json(200, {"embedding": item["emb"].tolist(),
                                     "latency_ms": ms})
                else:
                    self._json(200, {
                        "topk": [
                            {"text": engine.bank_texts[int(j)],
                             "score": float(s)}
                            for s, j in zip(item["scores"], item["idx"])
                        ],
                        "n_clips": int(mask.sum()),
                        "latency_ms": ms,
                    })
            except FileNotFoundError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def build_server(args) -> tuple[ThreadingHTTPServer, InferenceEngine]:
    if getattr(args, "artifact", None):
        # frozen jax.export program (scripts/export_model.py): no model
        # classes or config system on this path — RetrievalArtifact
        # duck-types InferenceEngine for the batcher/handler
        from deepcoro_clip_tpu.serving import RetrievalArtifact

        engine = RetrievalArtifact(args.artifact)
        batcher = MicroBatcher(engine, window_ms=args.batch_window_ms)
        httpd = ThreadingHTTPServer((args.host, args.port),
                                    make_handler(engine, batcher))
        httpd.batcher = batcher
        return httpd, engine

    from deepcoro_clip_tpu.registry import register_all

    register_all()
    if args.tiny:
        from deepcoro_clip_tpu.flagship import tiny_config

        cfg = tiny_config(multi_video=True, num_videos=args.num_videos)
    elif args.base_config:
        from deepcoro_clip_tpu.configs.parser import parse_config

        cfg = parse_config(["--base_config", args.base_config])
        cfg.multi_video = True
        cfg.num_videos = args.num_videos
    else:
        from deepcoro_clip_tpu.flagship import flagship_config

        cfg = flagship_config(multi_video=True, num_videos=args.num_videos)

    video_params = None
    if args.checkpoint:
        # restore the video tower from a CLIP training run: build the full
        # bundle as the restore template, keep only the serving subtree
        import jax

        from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
        from deepcoro_clip_tpu.train.checkpoint import CheckpointManager
        from deepcoro_clip_tpu.train.clip import build_clip_bundle

        mesh = make_mesh(MeshSpec(data=jax.device_count(), model=1))
        _, state = build_clip_bundle(
            cfg, mesh, jax.random.PRNGKey(0), steps_per_epoch=1)
        state = CheckpointManager(args.checkpoint).restore(state, args.ckpt_name)
        video_params = state.params["video_encoder"]

    if args.text_bank:
        bank = np.load(args.text_bank, allow_pickle=True)
        bank_emb, bank_texts = bank["text_embeddings"], bank["texts"]
    else:  # wire/latency smoke without a bank
        r = np.random.default_rng(0)
        bank_emb = r.normal(size=(args.demo_bank, cfg.embedding_dim))
        bank_texts = [f"demo report {i}" for i in range(args.demo_bank)]

    engine = InferenceEngine(cfg, bank_emb, bank_texts,
                             max_batch=args.max_batch, top_k=args.top_k,
                             video_params=video_params)
    batcher = MicroBatcher(engine, window_ms=args.batch_window_ms)
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(engine, batcher))
    httpd.batcher = batcher  # tests reach the stats through the server
    return httpd, engine


def main(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--artifact", default=None,
                    help="serve a frozen jax.export artifact dir "
                         "(scripts/export_model.py); overrides model args")
    ap.add_argument("--base_config", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoints dir of a CLIP run")
    ap.add_argument("--ckpt_name", default="checkpoint")
    ap.add_argument("--text_bank", default=None,
                    help="npz from scripts/generate_embeddings.py")
    ap.add_argument("--demo_bank", type=int, default=1000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--batch_window_ms", type=float, default=10.0)
    ap.add_argument("--num_videos", type=int, default=10)
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke)")
    args = ap.parse_args(argv)

    httpd, engine = build_server(args)
    # warm the one compiled program before accepting traffic
    study, mask = engine.load_study([])
    engine.infer_batch(study[None], mask[None])
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(max_batch={args.max_batch}, num_videos={args.num_videos}, "
          f"bank={len(engine.bank_texts)})", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
