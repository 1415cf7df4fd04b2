"""Host-loader stage profiler (CPU only; no chip required).

The quality run is loader-bound on this 1-core host (CLAUDE.md: 1.25 s/step
at B=16 before the RandAugment vectorization). This tool measures where the
per-batch time actually goes so loader optimization targets are chosen from
data, mirroring dev/profile_step.py's role for the device step:

  stage breakdown per clip: np.load | frame gather/resize | RandAugment |
  tokenize | collate-assemble, plus an end-to-end PrefetchLoader rate with
  the production thread pool.

Usage: python dev/loader_profile.py [n_clips] [--corpus DIR]
Generates a throwaway mini-corpus under /tmp if no corpus exists.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _ensure_corpus(n: int) -> Path:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from deepcoro_clip_tpu.data.synthetic_angio import generate_corpus

    for cand in (REPO / ".synth_corpus", Path("/tmp/.loader_prof_corpus")):
        if (cand / "data.csv").exists():
            return cand
    out = Path("/tmp/.loader_prof_corpus")
    print(f"generating mini corpus ({n} clips) ...", flush=True)
    generate_corpus(out, n_train=n, n_val=8, size=224, frames=16, seed=0,
                    max_findings=2, paraphrase=True, coarse_pct=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("n_clips", nargs="?", type=int, default=128)
    ap.add_argument("--corpus", type=Path, default=None)
    args = ap.parse_args()
    n_clips = args.n_clips
    corpus = args.corpus if args.corpus is not None else _ensure_corpus(n_clips)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from deepcoro_clip_tpu.data import video_io
    from deepcoro_clip_tpu.data.collate import collate_clip
    from deepcoro_clip_tpu.data.datasets import VideoClipDataset
    from deepcoro_clip_tpu.data.loader import PrefetchLoader
    from deepcoro_clip_tpu.data.sampler import ShardedBatchSampler
    from deepcoro_clip_tpu.data.tokenizer import get_tokenizer

    B, TEXT_LEN = 16, 512
    ds = VideoClipDataset(
        data_filename=str(corpus / "data.csv"), split="train",
        frames=16, resize=224, stride=1, rand_augment=True,
        wire_dtype="uint8",
    )
    n = min(n_clips, len(ds))
    tok = get_tokenizer(max_length=TEXT_LEN)

    # ---- stage timers over individual clips ----------------------------
    paths = [ds.samples[i]["paths"][0] for i in range(n)]
    texts = [ds.samples[i]["text"] for i in range(n)]
    rng = np.random.default_rng(0)

    t = {}

    def timed(key, fn, *a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        t[key] = t.get(key, 0.0) + time.perf_counter() - t0
        return out

    raws = [timed("np.load", video_io._load_raw, p) for p in paths]
    idxs = [timed("frame_idx", video_io.sample_frame_indices,
                  r.shape[0], 16, 1, rng) for r in raws]
    gathered = [timed("gather+resize", lambda r=r, i=i: video_io
                      ._resize_frames(np.ascontiguousarray(r[i]), 224))
                for r, i in zip(raws, idxs)]
    # The production uint8 wire rides the fused native kernel
    # (fv_sample_resize_u8: gather+resize in one pass) when available —
    # time it too so stage attribution reflects the real loader path, not
    # just the manual numpy composition above (which the fused kernel
    # replaces wholesale).
    from deepcoro_clip_tpu.data import fastvideo_binding as _fast

    if _fast.u8_available() and raws and raws[0].dtype == np.uint8:
        _ = [timed("fused native u8 (prod path)",
                   lambda r=r, i=i: _fast.sample_resize_u8(
                       r, np.asarray(i, dtype=np.int64), 224, 224))
             for r, i in zip(raws, idxs)]
    _ = [timed("augment", video_io.augment_frames, g.copy(), rng)
         for g in gathered]
    _ = [timed("tokenize", tok, [tx], max_length=TEXT_LEN,
               padding="max_length", truncation=True) for tx in texts]

    # full __getitem__ + collate (production composition, fresh timers)
    t0 = time.perf_counter()
    items = [ds[i] for i in range(n)]
    t["__getitem__"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in range(0, n - B + 1, B):
        collate_clip(items[s:s + B], tok, max_text_length=TEXT_LEN)
    t["collate(tok+assemble)"] = time.perf_counter() - t0

    print(f"== per-clip stages over {n} clips (ms/clip) ==")
    print("   (note: 'gather+resize' times the manual numpy path; the"
          " production uint8 wire replaces it with the fused native kernel"
          " — see the 'fused native u8' row when present. On an already-"
          f"{224}px corpus resize is a no-op either way.)")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {1e3 * v / n:8.2f}")

    # ---- end-to-end loader rate (thread backend, production shape) -----
    sampler = ShardedBatchSampler(n, B, shuffle=False, drop_last=True)
    loader = PrefetchLoader(
        ds, sampler, lambda it: collate_clip(it, tok,
                                             max_text_length=TEXT_LEN),
        num_workers=2, prefetch_batches=2,
    )
    t0 = time.perf_counter()
    nb = 0
    for _ in loader:
        nb += 1
    dt = time.perf_counter() - t0
    print(f"== end-to-end: {nb} batches of {B} in {dt:.2f}s -> "
          f"{1e3 * dt / max(nb, 1):.1f} ms/batch, "
          f"{nb * B / dt:.1f} clips/s ==")


if __name__ == "__main__":
    main()
