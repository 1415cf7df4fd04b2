"""Autoregressive captioning decoder over video tokens.

Behavioral parity with the reference ``CaptioningDecoder`` / ``LocCaDecoder``
(reference: models/captioning_decoder.py:11-463, models/locca_decoder.py:
223-455): transformer decoder layers with causal self-attention +
cross-attention into the video patch tokens, learned positions, tied-input
token embeddings, greedy / temperature-sampling generation.

TPU-first generation: fixed ``max_length`` lax.scan — each step re-runs the
(static-shape) decoder on the padded sequence under a causal mask and takes
the next-token logits. O(L^2) recompute per sequence is irrelevant at report
lengths (<=128) and keeps XLA shapes fully static; a KV-cache variant is a
planned optimisation.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.models.layers import Attention, MlpBlock, dense
from deepcoro_clip_tpu.registry import ModelRegistry


class DecoderLayer(nn.Module):
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
        x = x + Attention(
            self.dim, self.num_heads, self.dropout, self.dtype, self.use_flash,
            name="cross_attn",
        )(h, context=memory, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + MlpBlock(
            self.dim * 4, self.dim, self.dropout, self.dtype, name="mlp"
        )(h, deterministic=deterministic)
        return x


@ModelRegistry.register("captioning_decoder")
class CaptioningDecoder(nn.Module):
    vocab_size: int = 30522
    dim: int = 512
    depth: int = 4
    num_heads: int = 8
    max_length: int = 128
    memory_dim: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

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
            self.vocab_size, self.dim, param_dtype=jnp.float32, name="token_emb"
        )(input_ids)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (self.max_length, self.dim), jnp.float32,
        )
        x = (tok + pos[None, :L, :]).astype(self.dtype)
        memory = dense(self.dim, dtype=self.dtype, name="memory_proj")(
            video_tokens.astype(self.dtype)
        )
        for i in range(self.depth):
            x = DecoderLayer(
                self.dim, self.num_heads, self.dropout, self.dtype,
                self.use_flash, name=f"layer{i}",
            )(x, memory, self_mask=attention_mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        logits = dense(self.vocab_size, dtype=jnp.float32, name="lm_head")(x)
        return logits


def greedy_generate(
    decoder: CaptioningDecoder,
    params,
    video_tokens,
    bos_id: int,
    eos_id: int,
    max_length: Optional[int] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Static-shape greedy/sampled decoding (reference generate(),
    models/captioning_decoder.py). Returns [B, max_length] int32 (BOS first).
    """
    max_length = max_length or decoder.max_length
    B = video_tokens.shape[0]
    ids0 = jnp.full((B, max_length), 0, jnp.int32).at[:, 0].set(bos_id)
    finished0 = jnp.zeros((B,), bool)

    def step(carry, i):
        ids, finished, rng_k = carry
        logits = decoder.apply(
            params, ids, video_tokens, deterministic=True
        )  # [B, L, V]
        nxt_logits = logits[:, i, :]
        if temperature > 0.0:
            rng_k, sub = jax.random.split(rng_k)
            nxt = jax.random.categorical(sub, nxt_logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(nxt_logits, axis=-1)
        nxt = jnp.where(finished, 0, nxt).astype(jnp.int32)
        ids = ids.at[:, i + 1].set(nxt)
        finished = finished | (nxt == eos_id)
        return (ids, finished, rng_k), None

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    (ids, _, _), _ = jax.lax.scan(
        step, (ids0, finished0, rng), jnp.arange(max_length - 1)
    )
    return ids
