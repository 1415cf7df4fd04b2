"""Biomedical text encoder: BERT-architecture transformer + projection head.

The reference wraps HuggingFace PubMedBERT, strips the pooler, takes the CLS
token and projects to the shared space (reference: models/text_encoder.py:27-137).
Zero-egress TPU build: we implement the exact BERT-base architecture (post-LN,
learned positions) in flax so that

- a locally available PubMedBERT torch checkpoint can be imported 1:1 via
  ``deepcoro_clip_tpu.utils.hf_import`` (same tensor layout), and
- without one, the encoder trains from scratch with the same capacity
  (vocab 30522, 12 layers, dim 768 — PubMedBERT-base shape).

Attention masking runs through the same flash-attention op as the video tower.
"""

from __future__ import annotations

import os

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from deepcoro_clip_tpu.models.layers import (
    ProjectionHead,
    dense,
    epilogue_barrier,
)
from deepcoro_clip_tpu.ops.flash_attention import flash_attention
from deepcoro_clip_tpu.ops.flash_attention_packed import flash_attention_packed
from deepcoro_clip_tpu.registry import ModelRegistry


class BertSelfAttention(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, attention_mask, deterministic=True):
        B, L, _ = x.shape
        hd = self.dim // self.num_heads
        q = dense(self.dim, (None, "model"), dtype=self.dtype, name="query")(x)
        k = dense(self.dim, (None, "model"), dtype=self.dtype, name="key")(x)
        v = dense(self.dim, (None, "model"), dtype=self.dtype, name="value")(x)

        if (self.use_flash and hd % 128 == 0
                and os.environ.get("DEEPCORO_PACKED_ATTN", "1") == "1"):
            # packed layout: no head transposes around the Pallas call
            # (ops/flash_attention_packed.py; q/k/v stay separate denses
            # for HF BERT parameter parity)
            out = flash_attention_packed(
                q, k, v, num_heads=self.num_heads, kv_mask=attention_mask,
            )
        else:
            def split(t):
                return t.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)

            out = flash_attention(
                split(q), split(k), split(v),
                kv_mask=attention_mask,
                backend="auto" if self.use_flash else "xla",
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        out = dense(self.dim, ("model", None), dtype=self.dtype, name="out")(out)
        out = epilogue_barrier(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class BertLayer(nn.Module):
    """Post-LN BERT block (matches HF BertLayer tensor layout)."""

    dim: int
    num_heads: int
    mlp_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, attention_mask, deterministic=True):
        attn = BertSelfAttention(
            self.dim, self.num_heads, self.dropout, self.dtype, self.use_flash,
            name="attention",
        )(x, attention_mask, deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="attention_norm")(x + attn)
        x = x.astype(self.dtype)
        h = dense(self.mlp_dim, (None, "model"), dtype=self.dtype, name="intermediate")(x)
        h = epilogue_barrier(h)
        h = nn.gelu(h, approximate=False)  # exact erf GELU (HF BERT parity)
        h = dense(self.dim, ("model", None), dtype=self.dtype, name="output")(h)
        h = epilogue_barrier(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="output_norm")(x + h)
        return x.astype(self.dtype)


@ModelRegistry.register("text_encoder")
class TextEncoder(nn.Module):
    embedding_dim: int = 512
    vocab_size: int = 30522
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: Optional[int] = None  # defaults to 4*dim (BERT-base)
    max_positions: int = 512
    dropout: float = 0.1
    proj_dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True,
                 return_hidden=False):
        """input_ids: [B, L] int32; attention_mask: [B, L] (1 = real token).

        Returns [B, embedding_dim] (CLS token -> projection head), or the
        full hidden states [B, L, dim] when ``return_hidden`` (weight-import
        parity checks, captioning memory).
        """
        B, L = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.dim, param_dtype=jnp.float32,
            name="word_embeddings",
        )(input_ids)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (self.max_positions, self.dim), jnp.float32,
        )
        x = tok + pos[None, :L, :]
        x = nn.LayerNorm(dtype=jnp.float32, name="embeddings_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x.astype(self.dtype)

        for i in range(self.depth):
            x = BertLayer(
                self.dim, self.num_heads, self.mlp_dim or self.dim * 4,
                self.dropout, self.dtype, self.use_flash, name=f"layer{i}",
            )(x, attention_mask, deterministic)

        if return_hidden:
            return x
        cls = x[:, 0, :]  # CLS-token output (reference: text_encoder.py:120-137)
        return ProjectionHead(
            self.embedding_dim, dropout=self.proj_dropout, dtype=self.dtype,
            name="proj",
        )(cls, deterministic=deterministic)


def text_encoder_from_config(cfg) -> TextEncoder:
    return TextEncoder(
        embedding_dim=cfg.embedding_dim,
        vocab_size=cfg.text_vocab_size,
        dim=cfg.text_dim,
        depth=cfg.text_depth,
        num_heads=cfg.text_heads,
        max_positions=max(512, cfg.max_text_length),
        dropout=cfg.dropout,
        dtype=jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32,
        use_flash=cfg.use_pallas_attention,
    )
