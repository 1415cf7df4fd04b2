"""Location-aware captioning decoder (LocCa).

Specialized decoder architecture mirroring the reference ``LocCaDecoder``
(reference: models/locca_decoder.py:56 ``LocCaCrossAttention``, :135
``LocCaDecoderLayer``, :223-455 ``LocCaDecoder``), TPU-native:

- **Coordinate-conditioned cross-attention**: the unpooled vision tokens are
  augmented with learned embeddings of their normalized (t, h, w) grid
  coordinates before every cross-attention k/v projection, so attention keys
  carry explicit spatial identity — the "location-aware" conditioning that
  lets the decoder ground location tokens (anatomical segments, percents)
  spatially. The reference reaches the same goal through its
  location-token task decomposition (utils/loss/locca_loss.py) feeding a
  per-layer vision-dim cross-attention; here the conditioning is explicit.
- Sinusoidal (non-learned) text positions + sqrt(d_model) embedding scale
  (reference :40-54, :343-349).
- Pre-norm layers: causal self-attention, cross-attention with per-layer
  k/v projections straight from the vision dimension (reference
  LocCaCrossAttention takes ``vision_dim``), GELU FFN.
- UNtied output projection, std-0.02 init (reference :300-320 documents why
  tying breaks next-token learning at init).

``__call__`` has the same signature as ``CaptioningDecoder`` so the greedy /
KV-cache generation helpers and the ``locca_enabled`` wiring work unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.models.layers import Attention, MlpBlock, dense
from deepcoro_clip_tpu.registry import ModelRegistry


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Standard transformer sinusoidal table (reference
    PositionalEncoding, models/locca_decoder.py:23-54)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * (-np.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return pe


def grid_coordinates(grid: Tuple[int, int, int],
                     n_special: int = 0) -> np.ndarray:
    """Normalized (t, h, w) in [0, 1] per vision token, zeros for leading
    special (CLS) tokens. Shape [n_special + T*H*W, 3]."""
    T, H, W = grid
    t, h, w = np.meshgrid(
        np.arange(T), np.arange(H), np.arange(W), indexing="ij"
    )
    coords = np.stack(
        [t / max(T - 1, 1), h / max(H - 1, 1), w / max(W - 1, 1)], axis=-1
    ).reshape(-1, 3).astype(np.float32)
    if n_special:
        coords = np.concatenate(
            [np.zeros((n_special, 3), np.float32), coords], 0
        )
    return coords


class LocCaDecoderLayer(nn.Module):
    """Pre-norm causal self-attention + location-conditioned cross-attention
    + FFN (reference LocCaDecoderLayer, models/locca_decoder.py:135-220)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, memory, self_mask=None, deterministic=True):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + Attention(
            self.dim, self.num_heads, self.dropout, self.dtype, self.use_flash,
            name="self_attn",
        )(h, kv_mask=self_mask, causal=True, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        # per-layer k/v projection from the coordinate-conditioned memory
        # (reference LocCaCrossAttention k_proj/v_proj from vision_dim)
        x = x + Attention(
            self.dim, self.num_heads, self.dropout, self.dtype, self.use_flash,
            name="cross_attn",
        )(h, context=memory, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + MlpBlock(
            self.dim * 4, self.dim, self.dropout, self.dtype, name="mlp"
        )(h, deterministic=deterministic)
        return x


@ModelRegistry.register("locca_decoder")
class LocCaDecoder(nn.Module):
    vocab_size: int = 30522
    dim: int = 512
    depth: int = 4
    num_heads: int = 8
    max_length: int = 128
    memory_dim: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True
    # vision token grid (T', H', W') AFTER backbone pooling; None disables
    # coordinate conditioning (falls back to unconditioned cross-attention)
    token_grid: Optional[Tuple[int, int, int]] = None
    n_special_tokens: int = 0

    @nn.compact
    def __call__(
        self,
        input_ids,
        video_tokens,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """input_ids: [B, L]; video_tokens: [B, Lv, memory_dim].
        Returns next-token logits [B, L, vocab]."""
        B, L = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.dim,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32, name="token_emb",
        )(input_ids)
        pe = sinusoidal_positions(self.max_length, self.dim)
        x = (tok * np.sqrt(self.dim) + jnp.asarray(pe)[None, :L, :]).astype(
            self.dtype
        )
        if not deterministic and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)

        memory = video_tokens.astype(self.dtype)
        if self.token_grid is not None:
            coords = grid_coordinates(self.token_grid, self.n_special_tokens)
            Lc, Lm = coords.shape[0], memory.shape[1]
            if Lm % Lc != 0:
                # location conditioning is the module's purpose — a silent
                # skip would train a plain decoder while the config says
                # LocCa is on. Shapes are static, so fail at trace time.
                raise ValueError(
                    f"LocCaDecoder token_grid {self.token_grid} (+"
                    f"{self.n_special_tokens} special) gives {Lc} coords, "
                    f"but memory has {Lm} tokens (not a multiple); check "
                    "locca_token_grid against the backbone's grid")
            # learned location embedding per token, added in vision space;
            # multi-video memory [B, N*L, D] repeats the per-video grid N×
            loc = nn.Dense(
                self.memory_dim, dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.02),
                name="coord_emb",
            )(jnp.asarray(coords))
            if Lm != Lc:
                loc = jnp.tile(loc, (Lm // Lc, 1))
            memory = memory + loc[None, :, :]

        for i in range(self.depth):
            x = LocCaDecoderLayer(
                self.dim, self.num_heads, self.dropout, self.dtype,
                self.use_flash, name=f"layer{i}",
            )(x, memory, self_mask=attention_mask,
              deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        # untied lm head (reference :311-320)
        logits = nn.Dense(
            self.vocab_size, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02), name="lm_head",
        )(x)
        return logits


def locca_token_grid(config) -> Tuple[Tuple[int, int, int], int]:
    """(T', H', W') of the backbone's FINAL token grid plus the special-token
    count, derived from the config (each pool stage halves H and W —
    models/video_encoder.py:_pool_tokens)."""
    pt, ph, pw = tuple(config.vit_patch)
    # ceil division: PatchEmbed3D right-pads non-divisible inputs up to a
    # whole patch grid (models/layers.py), so the grid must round UP too
    T = -(-config.frames // pt)
    H = -(-config.resize // ph)
    W = -(-config.resize // pw)
    for _ in tuple(config.vit_pool_stages or ()):
        H //= 2
        W //= 2
    n_special = 1 if getattr(config, "use_cls_token", True) else 0
    return (T, H, W), n_special
