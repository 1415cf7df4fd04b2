"""Study-level aggregation over per-video embeddings.

Behavioral spec from the reference ``EnhancedVideoAggregator``
(reference: models/video_aggregator.py:57-159): learnable positional encoding
over up to ``max_segments`` videos, ``depth`` pre-LN transformer blocks, final
LayerNorm, then a learnable-query dot-product attention whose masked softmax
falls back to uniform weights when every segment is masked (:134-158).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from deepcoro_clip_tpu.models.layers import TransformerBlock, dense


class EnhancedVideoAggregator(nn.Module):
    dim: int
    num_heads: int = 8
    depth: int = 2
    dropout: float = 0.0
    max_segments: int = 1024
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic=True):
        """x: [B, N, D] per-video embeddings; mask: [B, N] True=real video.

        Returns [B, D] study embedding.
        """
        B, N, D = x.shape
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, self.max_segments, self.dim),
            jnp.float32,
        )
        x = x + pos[:, :N, :].astype(x.dtype)

        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, self.num_heads, dropout=self.dropout, dtype=self.dtype,
                use_flash=self.use_flash, name=f"block{i}",
            )(x, kv_mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)  # fp32 out

        # learnable-query attention weights over segments (fp32 for stable
        # softmax; reference computes this in fp32 too)
        query = self.param(
            "query", nn.initializers.normal(0.02), (self.dim,), jnp.float32
        )
        scores = jnp.einsum("bnd,d->bn", x, query) / jnp.sqrt(float(self.dim))
        if mask is not None:
            neg = jnp.finfo(jnp.float32).min
            scores = jnp.where(mask, scores, neg)
        weights = nn.softmax(scores, axis=-1)
        if mask is not None:
            # all-masked rows: fall back to uniform over N (reference
            # masked-softmax NaN fallback, models/video_aggregator.py:140-152)
            any_valid = jnp.any(mask, axis=-1, keepdims=True)
            weights = jnp.where(any_valid, weights, jnp.ones_like(weights) / N)
        out = jnp.einsum("bn,bnd->bd", weights, x)
        return out.astype(self.dtype)
