"""Token pooling heads.

- ``AttentionPool``: CLIP-style learnable-query multi-head attention over
  tokens -> [B, D] (reference: models/attention_pool.py:10-101).
- ``AttentionPoolWithCLS``: learnable CLS prepended, transformer layers,
  CLS output (reference: models/attention_pool.py:104-196).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from deepcoro_clip_tpu.models.layers import Attention, TransformerBlock, dense


class AttentionPool(nn.Module):
    dim: int
    num_heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True
    # reference contract (models/attention_pool.py:41-59): LayerNorm after
    # the pooled attention output, then an optional projection when the
    # requested output dim differs from the token dim (else identity).
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic=True):
        """x: [B, L, D]; mask: [B, L] (True = keep) -> [B, output_dim or D]."""
        B = x.shape[0]
        query = self.param(
            "query", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32
        )
        q = jnp.broadcast_to(query, (B, 1, self.dim)).astype(self.dtype)
        out = Attention(
            self.dim, self.num_heads, self.dropout, self.dtype, self.use_flash,
            name="attn",
        )(q, context=x, kv_mask=mask, deterministic=deterministic)[:, 0, :]
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(out).astype(
            self.dtype
        )
        if self.output_dim is not None and self.output_dim != self.dim:
            out = dense(self.output_dim, dtype=self.dtype, name="out_proj")(out)
        return out


class AttentionPoolWithCLS(nn.Module):
    dim: int
    num_heads: int = 8
    depth: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic=True):
        """x: [B, L, D] -> [B, output_dim or D] (prepended CLS position)."""
        B, L, D = x.shape
        cls = self.param(
            "cls", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(x.dtype), x], axis=1
        )
        if mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((B, 1), dtype=mask.dtype), mask], axis=1
            )
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, self.num_heads, dropout=self.dropout, dtype=self.dtype,
                use_flash=self.use_flash, name=f"block{i}",
            )(x, kv_mask=mask, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x[:, 0, :]).astype(
            x.dtype
        )
        if self.output_dim is not None and self.output_dim != self.dim:
            out = dense(self.output_dim, dtype=self.dtype, name="out_proj")(out)
        return out
