"""Per-study inference latency benchmark (p50 target: < 1 s vs the
reference's reported 4.2 s mean, BASELINE.md).

Measures the deployment path: one study = N angiographic clips ->
video-encoder study embedding -> top-k similarity against a text bank.
Host preprocessing (fastvideo) is measured separately from the device pass.

Usage: python scripts/bench_inference.py [n_clips_per_study] [bank_size]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Serving wire variants (see docs/KERNELS.md "Per-study inference"):
#   DEEPCORO_INFER_WIRE=f32    legacy float32 pixels (4 B/px H2D)
#   DEEPCORO_INFER_WIRE=u8     uint8 pixels, stats folded on-device (1 B/px)
#   DEEPCORO_INFER_WIRE=patch  uint8 patch-major (data/patch_wire.py): host
#                              space-to-depth, device patchify is a pure dot
WIRE = os.environ.get("DEEPCORO_INFER_WIRE", "patch")
# DEEPCORO_INFER_MONO=1: grayscale serving wire — the study travels as ONE
# uint8 channel (angiography sources are DICOM luma; config.mono_wire,
# models/layers._PatchProj folds the replication into the patchify weights).
# The native preprocessing kernels are channel-generic, so the host path
# runs on 1/3 the bytes with no new kernel.
MONO = os.environ.get("DEEPCORO_INFER_MONO", "0") == "1"
CHANNELS = 1 if MONO else 3


def main():
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.data import fastvideo_binding as fv
    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.models.video_encoder import video_encoder_from_config
    from deepcoro_clip_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    bank_size = int(sys.argv[2]) if len(sys.argv) > 2 else 30000

    cfg = flagship_config(multi_video=True, num_videos=n_clips)
    model = video_encoder_from_config(cfg)
    r = np.random.default_rng(0)

    shape = (1, n_clips, cfg.frames, cfg.resize, cfg.resize, CHANNELS)

    def make_study() -> np.ndarray:
        if WIRE == "f32":
            return r.normal(size=shape).astype(np.float32)
        clip = r.integers(0, 255, size=shape).astype(np.uint8)
        if WIRE == "patch":
            from deepcoro_clip_tpu.data.patch_wire import patchify_videos
            from deepcoro_clip_tpu.models.video_encoder import (
                resolve_architecture,
            )

            return patchify_videos(clip, tuple(resolve_architecture(cfg)
                                               ["vit_patch"]))
        return clip

    study = jnp.asarray(make_study())
    mask = jnp.ones((1, n_clips), bool)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)}, study,
                        video_mask=mask)
    bank = jnp.asarray(r.normal(size=(bank_size, cfg.embedding_dim))
                       .astype(np.float32))
    bank = bank / jnp.linalg.norm(bank, axis=1, keepdims=True)

    @jax.jit
    def infer(params, study, mask, bank):
        emb = model.apply(params, study, video_mask=mask, deterministic=True)
        emb = emb.astype(jnp.float32)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
        sim = emb @ bank.T
        scores, idx = jax.lax.top_k(sim, 5)
        return scores, idx

    s, i = infer(params, study, mask, bank)
    jax.block_until_ready(i)

    # vary the input each iteration: defeats any execution replay caching and
    # includes the H2D transfer of the study tensor (real deployment path;
    # for WIRE=patch the per-study host space-to-depth is measured with the
    # rest of the host preprocessing below)
    studies = [make_study() for _ in range(10)]
    lat = []
    for arr in studies:
        t0 = time.perf_counter()
        dev = jnp.asarray(arr)
        s, i = infer(params, dev, mask, bank)
        jax.block_until_ready(i)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)

    # host preprocessing for one study (fastvideo fused path, per wire:
    # f32 = gather+resize+normalize; u8 = gather+resize to uint8 (stats fold
    # on-device); patch = ONE fused gather+resize+space-to-depth kernel)
    raw = r.integers(0, 255, size=(60, 512, 512, CHANNELS)).astype(np.uint8)
    idx = np.linspace(0, 59, cfg.frames).astype(np.int64)
    mean = np.array([120.0] * CHANNELS)
    std = np.array([40.0] * CHANNELS)
    if fv.available():
        from deepcoro_clip_tpu.models.video_encoder import resolve_architecture

        patch = tuple(resolve_architecture(cfg)["vit_patch"])
        fused_patch = WIRE == "patch" and fv.u8_available()
        t0 = time.perf_counter()
        for _ in range(n_clips):
            if fused_patch:
                fv.sample_resize_patch(raw, idx, cfg.resize, cfg.resize, patch)
            elif WIRE == "u8" and fv.u8_available():
                fv.sample_resize_u8(raw, idx, cfg.resize, cfg.resize)
            else:
                fv.sample_resize_normalize(
                    raw, idx, cfg.resize, cfg.resize, mean, std
                )
        prep = time.perf_counter() - t0
        if WIRE == "patch" and not fused_patch:  # two-pass fallback
            from deepcoro_clip_tpu.data.patch_wire import patchify_videos

            clip = r.integers(0, 255, size=shape).astype(np.uint8)
            t0 = time.perf_counter()
            patchify_videos(clip, tuple(patch))
            prep += time.perf_counter() - t0
    else:
        prep = float("nan")

    print(f"study = {n_clips} clips x {cfg.frames}f@{cfg.resize}px, "
          f"bank = {bank_size} texts, wire = {WIRE}"
          + (" (mono)" if MONO else ""))
    print(f"device inference latency: p50 {np.percentile(lat, 50)*1e3:.1f} ms, "
          f"p95 {np.percentile(lat, 95)*1e3:.1f} ms")
    print(f"host preprocessing ({n_clips} clips): {prep*1e3:.1f} ms")
    total = np.percentile(lat, 50) + (prep if np.isfinite(prep) else 0)
    print(f"end-to-end p50 estimate: {total*1e3:.1f} ms "
          f"({'PASS' if total < 1.0 else 'MISS'} <1s target; reference 4.2s)")


if __name__ == "__main__":
    main()
