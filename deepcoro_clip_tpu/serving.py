"""Frozen serving artifacts: `jax.export`-serialized retrieval programs.

The reference deploys by shipping the full Python model stack plus a torch
checkpoint into a Docker image and rebuilding the model at serving time
(reference: scripts/external_validation.py:710-960, docker/Dockerfile).
The TPU-native counterpart freezes the COMPILED program instead: the whole
retrieval computation — video tower on the uint8 patch-major wire -> study
embedding -> L2 normalize -> text-bank similarity -> top-k — is traced
once, serialized as StableHLO via `jax.export`, and written to a
self-describing directory. Serving it back needs only jax + numpy: no
model classes, no config system, no checkpoint-template reconstruction,
and no risk that serving-side code drift changes the deployed numerics.

Artifact layout (``export_retrieval_artifact`` writes, ``RetrievalArtifact``
reads):

    program.jaxexport   jax.export serialization of the retrieval fn
                        (platform-specific: the tower bakes its Pallas-on-TPU
                        / XLA-elsewhere attention choice at trace time)
    params.msgpack      video-tower params as a flax msgpack state dict
    bank.npz            L2-normalized text embeddings [M, D] + texts [M]
    meta.json           wire shapes, patch geometry, platform, versions

Params and the bank stay ARGUMENTS of the exported call (not baked
constants), so a fine-tuned checkpoint or a refreshed text bank of the
same shape can be dropped into an existing artifact without re-export.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

FORMAT_VERSION = 1
PROGRAM_FILE = "program.jaxexport"
PARAMS_FILE = "params.msgpack"
BANK_FILE = "bank.npz"
META_FILE = "meta.json"


def _probing_fn(video_model, mil_model, hierarchical: bool, use_view: bool):
    """The frozen probing program: studies -> per-head raw logits.

    Mirrors train/linear_probe.forward_heads at inference settings; raw
    logits keep the artifact activation-agnostic (meta records each head's
    task so the loader applies sigmoid/softmax host-side, matching
    runners/linear_probing.py's prediction path).
    """

    def infer(params, studies, mask, *view):
        emb = video_model.apply(
            {"params": params["video_encoder"]}, studies, deterministic=True,
        )
        if hierarchical:
            B, N = studies.shape[:2]
            emb = emb.reshape(B, N, emb.shape[1] // N, emb.shape[-1])
        return mil_model.apply(
            {"params": params["mil"]}, emb, mask=mask,
            view_ids=view[0] if use_view else None, deterministic=True,
        )

    return infer


def _retrieval_fn(model, k: int):
    """The one serving program (mirrors scripts/serve.py InferenceEngine)."""
    import jax
    import jax.numpy as jnp

    def infer(params, bank, studies, mask):
        emb = model.apply(
            {"params": params}, studies, video_mask=mask, deterministic=True,
        ).astype(jnp.float32)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-8
        )
        scores, idx = jax.lax.top_k(emb @ bank.T, k)
        return emb, scores, idx

    return infer


def export_retrieval_artifact(
    cfg,
    out_dir,
    bank_emb: np.ndarray,
    bank_texts: Sequence[str],
    *,
    max_batch: int = 4,
    top_k: int = 5,
    video_params=None,
) -> dict:
    """Trace + serialize the retrieval program for ``cfg``; returns meta.

    ``video_params`` is the video-tower subtree of a CLIP checkpoint
    (``state.params["video_encoder"]``); ``None`` exports a random-init
    tower (wire/latency smoke artifacts).
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from deepcoro_clip_tpu.data.patch_wire import patch_grid
    from deepcoro_clip_tpu.models.video_encoder import (
        resolve_architecture,
        video_encoder_from_config,
    )

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    model = video_encoder_from_config(cfg)
    patch = tuple(resolve_architecture(cfg)["vit_patch"])
    N, T, R = int(cfg.num_videos), int(cfg.frames), int(cfg.resize)
    grid = patch_grid(T, R, R, patch)
    L = grid[0] * grid[1] * grid[2]
    K = patch[0] * patch[1] * patch[2] * 3

    if video_params is None:
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, N, L, K), jnp.uint8)
        video_params = model.init(
            {"params": rng, "dropout": rng}, dummy,
            video_mask=jnp.ones((1, N), bool),
        )["params"]
    # strip nn.Partitioned sharding boxes (pjit metadata is meaningless in
    # a frozen single-program artifact), then plain nested dicts:
    # msgpack_restore reproduces this exact pytree structure at load time,
    # matching the traced calling convention
    import flax.linen as nn

    params = serialization.to_state_dict(nn.meta.unbox(video_params))

    bank = np.asarray(bank_emb, np.float32)
    bank /= np.maximum(np.linalg.norm(bank, axis=1, keepdims=True), 1e-8)
    k = min(int(top_k), bank.shape[0])

    specs = (
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params
        ),
        jax.ShapeDtypeStruct(bank.shape, jnp.float32),
        jax.ShapeDtypeStruct((int(max_batch), N, L, K), jnp.uint8),
        jax.ShapeDtypeStruct((int(max_batch), N), jnp.bool_),
    )
    exported = jexport.export(jax.jit(_retrieval_fn(model, k)))(*specs)

    (out / PROGRAM_FILE).write_bytes(exported.serialize())
    (out / PARAMS_FILE).write_bytes(serialization.msgpack_serialize(params))
    np.savez(
        out / BANK_FILE,
        text_embeddings=bank,
        texts=np.asarray([str(t) for t in bank_texts], dtype=np.str_),
    )
    meta = {
        "format": FORMAT_VERSION,
        "kind": "retrieval",
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "wire": "patch_u8",
        "max_batch": int(max_batch),
        "num_videos": N,
        "frames": T,
        "resize": R,
        "patch": list(patch),
        "patch_grid": list(grid),
        "tokens_per_clip": L,
        "patch_bytes": K,
        "top_k": k,
        "embedding_dim": int(bank.shape[1]),
        "bank_size": int(bank.shape[0]),
    }
    (out / META_FILE).write_text(json.dumps(meta, indent=1))
    return meta


def export_probing_artifact(
    cfg,
    out_dir,
    *,
    max_batch: int = 4,
    probe_params=None,
) -> dict:
    """Freeze a linear-probing pipeline: studies -> per-head logits.

    ``probe_params`` is a probing checkpoint's ``state.params``
    (``{"video_encoder": ..., "mil": ...}``); ``None`` exports random init.
    This is the external-validation deployable (reference ships the Python
    stack into Docker instead, scripts/external_validation.py:710-960).
    """
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from flax import serialization
    from jax import export as jexport

    from deepcoro_clip_tpu.data.patch_wire import patch_grid
    from deepcoro_clip_tpu.models.video_encoder import (
        resolve_architecture,
        video_encoder_from_config,
    )
    from deepcoro_clip_tpu.train.linear_probe import _mil_from_config

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    hierarchical = bool(getattr(cfg, "hierarchical_tokens", False))
    use_view = bool(getattr(cfg, "use_view_embeddings", False))
    video_model = video_encoder_from_config(
        cfg, aggregate=False, per_video=not hierarchical
    )
    mil_model = _mil_from_config(cfg)

    patch = tuple(resolve_architecture(cfg)["vit_patch"])
    N, T, R = int(cfg.num_videos), int(cfg.frames), int(cfg.resize)
    grid = patch_grid(T, R, R, patch)
    L = grid[0] * grid[1] * grid[2]
    K = patch[0] * patch[1] * patch[2] * 3

    if probe_params is None:
        rng = jax.random.PRNGKey(0)
        rv, rm, rd = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, N, L, K), jnp.uint8)
        vparams = video_model.init({"params": rv, "dropout": rd}, dummy)["params"]
        emb = video_model.apply({"params": vparams}, dummy, deterministic=True)
        if hierarchical:
            emb = emb.reshape(1, N, emb.shape[1] // N, emb.shape[-1])
        mparams = mil_model.init(
            {"params": rm, "dropout": rd}, emb,
            mask=jnp.ones((1, N), bool),
            view_ids=jnp.zeros((1, N), jnp.int32) if use_view else None,
        )["params"]
        probe_params = {"video_encoder": vparams, "mil": mparams}
    params = serialization.to_state_dict(nn.meta.unbox(probe_params))

    arg_specs = [
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params
        ),
        jax.ShapeDtypeStruct((int(max_batch), N, L, K), jnp.uint8),
        jax.ShapeDtypeStruct((int(max_batch), N), jnp.bool_),
    ]
    if use_view:
        arg_specs.append(
            jax.ShapeDtypeStruct((int(max_batch), N), jnp.int32)
        )
    fn = _probing_fn(video_model, mil_model, hierarchical, use_view)
    exported = jexport.export(jax.jit(fn))(*arg_specs)

    (out / PROGRAM_FILE).write_bytes(exported.serialize())
    (out / PARAMS_FILE).write_bytes(serialization.msgpack_serialize(params))
    meta = {
        "format": FORMAT_VERSION,
        "kind": "probing",
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "wire": "patch_u8",
        "max_batch": int(max_batch),
        "num_videos": N,
        "frames": T,
        "resize": R,
        "patch": list(patch),
        "patch_grid": list(grid),
        "tokens_per_clip": L,
        "patch_bytes": K,
        "head_structure": {k: int(v) for k, v in cfg.head_structure.items()},
        "head_task": {k: str(cfg.head_task.get(k, "binary"))
                      for k in cfg.head_structure},
        "has_view_ids": use_view,
        "hierarchical_tokens": hierarchical,
    }
    (out / META_FILE).write_text(json.dumps(meta, indent=1))
    return meta


class _Artifact:
    """Shared loader: meta + platform guard + program + device params."""

    KIND = ""

    def __init__(self, path):
        import jax
        from flax import serialization
        from jax import export as jexport

        p = Path(path)
        self.path = p
        self.meta = json.loads((p / META_FILE).read_text())
        if self.meta.get("format") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta.get('format')} != "
                f"{FORMAT_VERSION} (re-export with this build)"
            )
        if self.meta.get("kind") != self.KIND:
            raise ValueError(
                f"artifact kind {self.meta.get('kind')!r} != {self.KIND!r} "
                f"(use {'RetrievalArtifact' if self.meta.get('kind') == 'retrieval' else 'ProbingArtifact'})"
            )
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise ValueError(
                f"artifact was exported for {self.meta['platforms']}, "
                f"current backend is {backend} (the tower's attention "
                "lowering is platform-specific; re-export on this platform)"
            )
        self._exported = jexport.deserialize((p / PROGRAM_FILE).read_bytes())
        params = serialization.msgpack_restore((p / PARAMS_FILE).read_bytes())
        # commit params to device once; per-call H2D is the studies only
        self._params = jax.device_put(params)
        self._block = jax.block_until_ready
        self.max_batch = int(self.meta["max_batch"])
        self.num_videos = int(self.meta["num_videos"])

    def load_study(self, paths) -> tuple:
        """Paths -> ([num_videos, L, K] uint8 patch-major, [num_videos] mask)."""
        from deepcoro_clip_tpu.data.patch_wire import patchify_videos
        from deepcoro_clip_tpu.data.video_io import load_video

        m, N = self.meta, self.num_videos
        paths = list(paths)[:N]
        clips = np.zeros(
            (1, N, m["frames"], m["resize"], m["resize"], 3), np.uint8
        )
        mask = np.zeros((N,), bool)
        for i, p in enumerate(paths):
            clips[0, i] = load_video(
                str(p), n_frames=m["frames"], resize=m["resize"],
                output_dtype="uint8",
            )
            mask[i] = True
        return patchify_videos(clips, tuple(m["patch"]))[0], mask

    def _pad(self, studies: np.ndarray, masks: np.ndarray):
        b = studies.shape[0]
        if b > self.max_batch:
            raise ValueError(
                f"batch {b} > compiled max_batch {self.max_batch}"
            )
        if b < self.max_batch:
            pad = self.max_batch - b
            studies = np.concatenate(
                [studies, np.zeros((pad,) + studies.shape[1:], studies.dtype)]
            )
            masks = np.concatenate(
                [masks, np.zeros((pad,) + masks.shape[1:], bool)]
            )
        return studies, masks, b


class RetrievalArtifact(_Artifact):
    """Serve a frozen artifact — imports only jax/flax-serialization/numpy.

    Duck-types scripts/serve.py's ``InferenceEngine`` (``max_batch``,
    ``num_videos``, ``bank_texts``, ``load_study``, ``infer_batch``) so the
    micro-batching HTTP server can run straight off an artifact directory.
    """

    KIND = "retrieval"

    def __init__(self, path):
        import jax

        super().__init__(path)
        with np.load(self.path / BANK_FILE) as z:
            bank = z["text_embeddings"]
            self.bank_texts = [str(t) for t in z["texts"]]
        self._bank = jax.device_put(np.asarray(bank, np.float32))
        self.top_k = int(self.meta["top_k"])

    def swap_params(self, video_params) -> None:
        """Drop in a same-shape fine-tuned tower without re-export."""
        import jax
        import flax.linen as nn
        from flax import serialization

        self._params = jax.device_put(
            serialization.to_state_dict(nn.meta.unbox(video_params))
        )

    def infer_batch(self, studies: np.ndarray, masks: np.ndarray):
        """[B<=max_batch, N, L, K] u8 -> (emb [B,D], scores [B,k], idx [B,k])."""
        studies, masks, b = self._pad(studies, masks)
        emb, scores, idx = self._exported.call(
            self._params, self._bank,
            np.ascontiguousarray(studies, np.uint8), masks.astype(bool),
        )
        self._block(idx)
        return (np.asarray(emb)[:b], np.asarray(scores)[:b],
                np.asarray(idx)[:b])

    def retrieve(self, paths) -> list:
        """One study's video paths -> top-k [{text, score}] (convenience)."""
        study, mask = self.load_study(paths)
        _, scores, idx = self.infer_batch(study[None], mask[None])
        return [
            {"text": self.bank_texts[int(j)], "score": float(s)}
            for j, s in zip(idx[0], scores[0])
        ]


class ProbingArtifact(_Artifact):
    """Frozen linear-probing pipeline: studies -> per-head predictions."""

    KIND = "probing"

    def infer_batch(self, studies: np.ndarray, masks: np.ndarray,
                    view_ids: Optional[np.ndarray] = None) -> dict:
        """[B<=max_batch, N, L, K] u8 -> {head: logits [B, C]} (raw)."""
        studies, masks, b = self._pad(studies, masks)
        args = [self._params, np.ascontiguousarray(studies, np.uint8),
                masks.astype(bool)]
        if self.meta["has_view_ids"]:
            if view_ids is None:
                view_ids = np.zeros(studies.shape[:2], np.int32)
            elif view_ids.shape[0] < self.max_batch:
                view_ids = np.concatenate([
                    view_ids,
                    np.zeros((self.max_batch - view_ids.shape[0],)
                             + view_ids.shape[1:], np.int32),
                ])
            args.append(view_ids.astype(np.int32))
        out = self._exported.call(*args)
        self._block(out)
        return {h: np.asarray(v)[:b] for h, v in out.items()}

    def predict(self, studies: np.ndarray, masks: np.ndarray,
                view_ids: Optional[np.ndarray] = None) -> dict:
        """Logits -> probabilities per meta head_task (sigmoid for binary,
        softmax for multiclass, identity for regression) — host-side, same
        convention as runners/linear_probing.py's prediction CSVs."""
        logits = self.infer_batch(studies, masks, view_ids)
        out = {}
        for h, x in logits.items():
            task = self.meta["head_task"].get(h, "binary")
            if task == "binary":
                out[h] = 1.0 / (1.0 + np.exp(-x))
            elif task == "multiclass":
                e = np.exp(x - x.max(-1, keepdims=True))
                out[h] = e / e.sum(-1, keepdims=True)
            else:  # regression
                out[h] = x
        return out
