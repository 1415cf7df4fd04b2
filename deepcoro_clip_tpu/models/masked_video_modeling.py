"""Masked video modeling (MAE-style) auxiliary task.

Behavioral parity with the reference ``MaskedVideoModeling``
(reference: models/masked_video_modeling.py:10-350): random token masking at
``mask_ratio`` (:62), a learnable mask token, a lightweight transformer
decoder (:233-296), and normalized-target MSE restricted to masked positions
(forward_loss, :159).

TPU twist: the random mask comes from ``jax.random.permutation`` via argsort
of uniform noise (static shapes); the loss masks rather than gathers.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.models.layers import TransformerBlock, dense
from deepcoro_clip_tpu.registry import ModelRegistry


def random_token_mask(rng, B: int, L: int, mask_ratio: float):
    """[B, L] bool mask: True = MASKED. Exactly round(L*ratio) per sample."""
    n_mask = int(round(L * mask_ratio))
    noise = jax.random.uniform(rng, (B, L))
    order = jnp.argsort(noise, axis=1)
    ranks = jnp.argsort(order, axis=1)
    return ranks < n_mask


@ModelRegistry.register("masked_video_modeling")
class MaskedVideoModeling(nn.Module):
    dim: int = 512           # encoder token dim (input)
    decoder_dim: int = 256
    decoder_depth: int = 2
    num_heads: int = 8
    mask_ratio: float = 0.75
    norm_targets: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        tokens,          # [B, L, dim] encoder patch tokens (targets)
        mask,            # [B, L] bool, True = masked
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        B, L, D = tokens.shape
        x = dense(self.decoder_dim, dtype=self.dtype, name="enc_proj")(
            tokens.astype(self.dtype)
        )
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02),
            (1, 1, self.decoder_dim), jnp.float32,
        )
        x = jnp.where(
            mask[..., None],
            jnp.broadcast_to(mask_token, (B, L, self.decoder_dim)).astype(x.dtype),
            x,
        )
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (1, L, self.decoder_dim), jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        for i in range(self.decoder_depth):
            x = TransformerBlock(
                self.decoder_dim, self.num_heads, dtype=self.dtype,
                use_flash=self.use_flash, name=f"block{i}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        pred = dense(D, dtype=jnp.float32, name="pred")(x)  # [B, L, D]

        target = tokens.astype(jnp.float32)
        if self.norm_targets:
            mu = target.mean(-1, keepdims=True)
            var = target.var(-1, keepdims=True)
            target = (target - mu) / jnp.sqrt(var + 1e-6)
        per_tok = ((pred - target) ** 2).mean(-1)  # [B, L]
        m = mask.astype(jnp.float32)
        loss = (per_tok * m).sum() / jnp.maximum(m.sum(), 1.0)
        return {"loss": loss, "pred": pred, "mask": mask}
