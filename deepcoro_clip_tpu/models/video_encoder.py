"""Video encoder: 3D-RoPE video transformer + projection + pooling + aggregation.

Public contract kept from the reference ``VideoEncoder``
(reference: models/video_encoder.py:18-637):

- input ``[B, N, T, H, W, C]`` (or ``[B, T, H, W, C]``, auto-expanded to N=1,
  reference :566-574);
- ``aggregate_videos_tokens=True``  -> study embedding ``[B, D]``
- ``per_video_pool=True``           -> per-video embeddings ``[B, N, D]``
- otherwise                          -> patch tokens ``[B, N*L, D]``
  (reference forward :615-637);
- ``get_tokens(mode)`` with mode in {"patch", "video", "study"}
  (reference :498-522).

TPU-first backbone ("CoroViT"): 3D-conv tubelet patchify + pre-LN transformer
blocks whose attention runs in the Pallas flash kernel with the 3D RoPE
rotation fused (ops/flash_attention.py). RoPE is a first-class argument, not a
monkey-patch (vs reference :259-388). Optional MViT-style multiscale stages
pool tokens 2x2 spatially at given block indices (reference's pooled attention
role, SURVEY.md §5.7) with RoPE tables rebuilt for each stage's grid.

Behavioral parity is the spec, not weight parity (SURVEY.md §7 "Hard parts"):
the reference's torchvision-MViT weights are not importable by design.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.models.attention_pool import AttentionPool
from deepcoro_clip_tpu.models.layers import (
    PatchEmbed3D,
    ProjectionHead,
    TransformerBlock,
    dense,
)
from deepcoro_clip_tpu.models.video_aggregator import EnhancedVideoAggregator
from deepcoro_clip_tpu.ops.rope3d import build_rope3d_tables
from deepcoro_clip_tpu.registry import ModelRegistry


class CoroViT(nn.Module):
    """Per-clip backbone: [B*N, T, H, W, C] -> tokens [B*N, L(+1), dim]."""

    dim: int = 512
    depth: int = 12
    num_heads: int = 4
    patch: Tuple[int, int, int] = (2, 16, 16)
    pool_stages: Sequence[int] = ()
    dropout: float = 0.0
    use_cls_token: bool = True
    rope_temporal_scale: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True
    # sequence parallelism for the backbone attention (ring over the token
    # axis; active only when the token count divides the ring-axis size)
    ring_mesh: Optional[object] = None
    ring_axis: str = "model"
    # dataset pixel stats: folded into the patchify weights for raw uint8
    # batches (models/layers.PatchEmbed3D)
    pixel_mean: Optional[Tuple[float, ...]] = None
    pixel_std: Optional[Tuple[float, ...]] = None
    # static token grid for the host patch-major wire ([B, L, K] inputs,
    # data/patch_wire.py); unused for spatial [B, T, H, W, C] inputs
    patch_grid: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x, (T, H, W) = PatchEmbed3D(self.dim, tuple(self.patch), self.dtype,
                                    pixel_mean=self.pixel_mean,
                                    pixel_std=self.pixel_std,
                                    patch_grid=self.patch_grid,
                                    name="patch_embed")(x)
        B = x.shape[0]
        n_special = 1 if self.use_cls_token else 0
        if self.use_cls_token:
            cls = self.param(
                "cls", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, self.dim)).astype(x.dtype), x], 1
            )

        head_dim = self.dim // self.num_heads
        tables = build_rope3d_tables(
            head_dim, T, H, W, n_special=n_special,
            temporal_scale=self.rope_temporal_scale,
        )
        sin, cos = tables.sin, tables.cos

        for i in range(self.depth):
            if i in self.pool_stages:
                x, (T, H, W) = self._pool_tokens(x, T, H, W, n_special, i)
                tables = build_rope3d_tables(
                    head_dim, T, H, W, n_special=n_special,
                    temporal_scale=self.rope_temporal_scale,
                )
                sin, cos = tables.sin, tables.cos
            x = TransformerBlock(
                self.dim, self.num_heads, dropout=self.dropout,
                dtype=self.dtype, use_flash=self.use_flash,
                ring_mesh=self.ring_mesh, ring_axis=self.ring_axis,
                name=f"block{i}",
            )(x, sin=sin, cos=cos, deterministic=deterministic)

        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return x  # [B*N, n_special + T*H*W, dim]

    def _pool_tokens(self, x, T, H, W, n_special, idx):
        """2x2 spatial token merge (multiscale stage)."""
        B, L, D = x.shape
        special, toks = x[:, :n_special], x[:, n_special:]
        g = toks.reshape(B, T, H // 2, 2, W // 2, 2, D)
        merged = g.mean(axis=(3, 5)).reshape(B, T * (H // 2) * (W // 2), D)
        merged = dense(D, (None, None), dtype=self.dtype, name=f"pool{idx}")(merged)
        return jnp.concatenate([special, merged], axis=1), (T, H // 2, W // 2)


@ModelRegistry.register("video_encoder")
class VideoEncoder(nn.Module):
    """Backbone + projection + per-video pooling + study aggregation."""

    embedding_dim: int = 512
    backbone_dim: int = 512
    depth: int = 12
    backbone_heads: int = 4
    patch: Tuple[int, int, int] = (2, 16, 16)
    pool_stages: Sequence[int] = ()
    num_heads: int = 8          # pooling/aggregator heads (reference num_heads)
    aggregator_depth: int = 2
    dropout: float = 0.1
    aggregate_videos_tokens: bool = True
    per_video_pool: bool = False
    pooling_mode: str = "mean"  # mean | attention | cls_token
    use_cls_token: bool = True
    rope_temporal_scale: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True
    ring_mesh: Optional[object] = None
    ring_axis: str = "model"
    pixel_mean: Optional[Tuple[float, ...]] = None
    pixel_std: Optional[Tuple[float, ...]] = None
    # token grid for patch-major wire inputs (data/patch_wire.py):
    # [B, N, L, K] / [B, L, K] uint8 instead of [B, N, T, H, W, C]
    patch_grid: Optional[Tuple[int, int, int]] = None

    def setup(self):
        self.backbone = CoroViT(
            dim=self.backbone_dim,
            depth=self.depth,
            num_heads=self.backbone_heads,
            patch=tuple(self.patch),
            pool_stages=tuple(self.pool_stages),
            dropout=self.dropout,
            use_cls_token=self.use_cls_token,
            rope_temporal_scale=self.rope_temporal_scale,
            dtype=self.dtype,
            use_flash=self.use_flash,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            pixel_mean=self.pixel_mean,
            pixel_std=self.pixel_std,
            patch_grid=self.patch_grid,
        )
        self.proj = ProjectionHead(
            self.embedding_dim, dropout=self.dropout, dtype=self.dtype
        )
        if self.pooling_mode == "attention":
            self.pool = AttentionPool(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                use_flash=self.use_flash,
            )
        self.aggregator = EnhancedVideoAggregator(
            dim=self.embedding_dim,
            num_heads=self.num_heads,
            depth=self.aggregator_depth,
            dropout=self.dropout,
            dtype=self.dtype,
            use_flash=self.use_flash,
        )

    @staticmethod
    def _with_video_axis(x):
        """Insert the N=1 video axis for unbatched-video inputs: spatial
        [B, T, H, W, C] (ndim 5) or patch-major [B, L, K] (ndim 3)."""
        return x[:, None] if x.ndim in (3, 5) else x

    def _encode_clips(self, x, deterministic):
        """[B, N, T, H, W, C] (or patch-major [B, N, L, K]) -> tokens
        [B, N, L, D_emb] (projected)."""
        B, N = x.shape[:2]
        clips = x.reshape((B * N,) + x.shape[2:])
        toks = self.backbone(clips, deterministic=deterministic)
        toks = self.proj(toks, deterministic=deterministic)
        L = toks.shape[1]
        return toks.reshape(B, N, L, self.embedding_dim)

    def _pool_video(self, toks, deterministic):
        """[B, N, L, D] -> [B, N, D] per-video embedding
        (reference _pool_video_tokens, models/video_encoder.py:595-603)."""
        B, N, L, D = toks.shape
        if self.pooling_mode == "cls_token" and self.use_cls_token:
            return toks[:, :, 0, :]
        if self.pooling_mode == "attention":
            flat = toks.reshape(B * N, L, D)
            pooled = self.pool(flat, deterministic=deterministic)
            return pooled.reshape(B, N, D)
        return toks.mean(axis=2)

    def __call__(
        self,
        x,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """x: [B, N, T, H, W, C] or [B, T, H, W, C]; video_mask: [B, N]
        (True = real video, False = zero-padded slot)."""
        x = self._with_video_axis(x)
        toks = self._encode_clips(x, deterministic)
        B, N, L, D = toks.shape

        if not self.aggregate_videos_tokens and not self.per_video_pool:
            return toks.reshape(B, N * L, D)

        per_video = self._pool_video(toks, deterministic)
        if self.per_video_pool and not self.aggregate_videos_tokens:
            return per_video
        return self.aggregator(
            per_video, mask=video_mask, deterministic=deterministic
        )

    def features(
        self,
        x,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """One backbone pass -> every granularity (the multitask runner's
        single-token-pass pattern, reference: runners/multitask_runner.py:
        764-793): {"tokens": [B,N,L,D], "video": [B,N,D], "study": [B,D]}."""
        x = self._with_video_axis(x)
        toks = self._encode_clips(x, deterministic)
        per_video = self._pool_video(toks, deterministic)
        study = self.aggregator(
            per_video, mask=video_mask, deterministic=deterministic
        )
        return {"tokens": toks, "video": per_video, "study": study}

    def aggregate(self, per_video, video_mask=None, deterministic: bool = True):
        """Aggregator applied to externally-supplied per-video embeddings
        [B, N, D] -> [B, D] (e.g. single-view consistency targets,
        reference: runners/multitask_runner.py:788-791)."""
        return self.aggregator(
            per_video, mask=video_mask, deterministic=deterministic
        )

    def get_tokens(self, x, mode: str = "patch", deterministic: bool = True):
        """mode: 'patch' -> [B, N, L, D]; 'video' -> [B, N, D];
        'study' -> [B, D] (reference get_tokens, models/video_encoder.py:498-522)."""
        x = self._with_video_axis(x)
        toks = self._encode_clips(x, deterministic)
        if mode == "patch":
            return toks
        per_video = self._pool_video(toks, deterministic)
        if mode == "video":
            return per_video
        if mode == "study":
            return self.aggregator(per_video, deterministic=deterministic)
        raise ValueError(f"unknown token mode {mode!r}")


# TPU-native size presets for the reference's ``model_name`` values
# (reference backbones: mvit_v2_s / r3d_18 / x3d_s / x3d_m,
# models/video_encoder.py:18-637). Weight parity is impossible by design;
# these match each backbone's capacity class with a CoroViT of similar
# parameter count and token budget. Explicit vit_* config fields override.
MODEL_PRESETS = {
    "mvit": dict(vit_dim=512, vit_depth=12, vit_heads=4,
                 vit_patch=(2, 16, 16), vit_pool_stages=(3,)),
    "mvit_rope": dict(vit_dim=512, vit_depth=12, vit_heads=4,
                      vit_patch=(2, 16, 16), vit_pool_stages=(3,)),
    "vit": dict(vit_dim=512, vit_depth=12, vit_heads=4,
                vit_patch=(2, 16, 16), vit_pool_stages=()),
    "x3d_s": dict(vit_dim=256, vit_depth=8, vit_heads=2,
                  vit_patch=(2, 16, 16), vit_pool_stages=(2,)),
    "x3d_m": dict(vit_dim=384, vit_depth=10, vit_heads=3,
                  vit_patch=(2, 16, 16), vit_pool_stages=(2,)),
    "r3d": dict(vit_dim=384, vit_depth=8, vit_heads=3,
                vit_patch=(4, 16, 16), vit_pool_stages=(2,)),
}


def resolve_architecture(cfg) -> dict:
    """model_name preset, overridden by explicitly-set vit_* fields (a field
    differing from the ClipConfig default is treated as explicit)."""
    from deepcoro_clip_tpu.configs.clip import ClipConfig

    preset = dict(MODEL_PRESETS.get(str(cfg.model_name).lower(), {}))
    defaults = ClipConfig()
    out = {}
    for key in ("vit_dim", "vit_depth", "vit_heads", "vit_patch",
                "vit_pool_stages"):
        explicit = getattr(cfg, key) != getattr(defaults, key)
        if explicit or key not in preset:
            out[key] = getattr(cfg, key)
        else:
            out[key] = preset[key]
    return out


def video_encoder_from_config(cfg, aggregate=None, per_video=None,
                              ring_mesh=None) -> VideoEncoder:
    """Build from a ClipConfig/LinearProbingConfig (field parity with the
    reference constructor args). ``ring_mesh``: enable ring (sequence-
    parallel) backbone attention over the mesh's ring axis."""
    from deepcoro_clip_tpu.ops.pixels import config_stats

    arch = resolve_architecture(cfg)
    _cfg_mean, _cfg_std = config_stats(cfg)
    return VideoEncoder(
        embedding_dim=cfg.embedding_dim,
        backbone_dim=arch["vit_dim"],
        depth=arch["vit_depth"],
        backbone_heads=arch["vit_heads"],
        patch=tuple(arch["vit_patch"]),
        pool_stages=tuple(arch["vit_pool_stages"]),
        num_heads=cfg.num_heads,
        aggregator_depth=cfg.aggregator_depth,
        dropout=cfg.dropout,
        aggregate_videos_tokens=(
            cfg.aggregate_videos_tokens if aggregate is None else aggregate
        ),
        per_video_pool=cfg.per_video_pool if per_video is None else per_video,
        pooling_mode=getattr(cfg, "pooling_mode", "mean"),
        use_cls_token=getattr(cfg, "use_cls_token", True),
        rope_temporal_scale=getattr(cfg, "rope_temporal_scale", 1.0),
        dtype=jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32,
        use_flash=cfg.use_pallas_attention,
        ring_mesh=ring_mesh,
        ring_axis=getattr(cfg, "ring_axis", "model"),
        # resolve stats exactly like the float wire (ops/pixels.config_stats
        # accepts legacy data_mean/data_std too) so both wires normalize
        # identically whichever field the config carries
        pixel_mean=(tuple(_cfg_mean) if _cfg_mean else None),
        pixel_std=(tuple(_cfg_std) if _cfg_std else None),
        patch_grid=_config_patch_grid(cfg, tuple(arch["vit_patch"])),
    )


def _config_patch_grid(cfg, patch) -> Optional[Tuple[int, int, int]]:
    """Static token grid from config clip dims — enables patch-major wire
    inputs ([B, N, L, K], data/patch_wire.py). Inert for spatial inputs;
    None when clip dims are absent or don't tile (then only the spatial
    wire is accepted)."""
    frames = getattr(cfg, "frames", None)
    size = getattr(cfg, "resize", None)
    if not frames or not size:
        return None
    pt, ph, pw = patch
    if frames % pt or size % ph or size % pw:
        return None
    return (frames // pt, size // ph, size // pw)
