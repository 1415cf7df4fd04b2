"""Autoregressive captioning decoder over video tokens.

Behavioral parity with the reference ``CaptioningDecoder`` / ``LocCaDecoder``
(reference: models/captioning_decoder.py:11-463, models/locca_decoder.py:
223-455): transformer decoder layers with causal self-attention +
cross-attention into the video patch tokens, learned positions, tied-input
token embeddings, greedy / temperature-sampling generation.

TPU-first generation: two static-shape paths.
- ``greedy_generate``: each scan step re-runs the full decoder under a causal
  mask (O(L^2) recompute; simple, shape-static).
- ``greedy_generate_kv``: incremental decoding with an explicit KV cache
  (O(L) per step; the reference ``generate()`` is incremental too). The cache
  is a preallocated [B, H, max_len, Dh] per layer, cross-attention K/V are
  computed once, and the scan body runs a single-token decoder step as plain
  functional code over the SAME param tree (parity-tested against the O(L^2)
  path).
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
        # embedding LayerNorm + dropout before the layers (reference:
        # models/captioning_decoder.py:70-71,150-156)
        x = nn.LayerNorm(dtype=jnp.float32, name="embed_norm")(
            tok + pos[None, :L, :]
        )
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic).astype(
            self.dtype
        )
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


# --------------------------------------------------------------------- #
# KV-cache incremental decoding
# --------------------------------------------------------------------- #


def _unbox(tree):
    return jax.tree_util.tree_map(
        lambda x: x.unbox() if hasattr(x, "unbox") else x,
        tree,
        is_leaf=lambda x: hasattr(x, "unbox"),
    )


def _ln(p, x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-6) * p["scale"] + p["bias"]


def _d(p, x):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


def greedy_generate_kv(
    decoder: CaptioningDecoder,
    params,
    video_tokens,
    bos_id: int,
    eos_id: int,
    max_length: Optional[int] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Incremental greedy/sampled decoding with an explicit KV cache.

    Same contract as ``greedy_generate`` ([B, max_length] int32, BOS first),
    O(L) work per step instead of O(L^2). Runs the single-token decoder step
    functionally over the decoder's own param tree in fp32 (generation is
    eval-only; fp32 keeps it exactly comparable to the full-recompute path).
    """
    max_length = max_length or decoder.max_length
    p = _unbox(params["params"] if "params" in params else params)
    # accept numpy trees (e.g. torch_import transplants): traced token ids
    # index into the embedding table, which requires a jax array
    p = jax.tree_util.tree_map(jnp.asarray, p)
    H, D = decoder.num_heads, decoder.dim
    Dh = D // H
    B = video_tokens.shape[0]

    memory = _d(p["memory_proj"], video_tokens.astype(jnp.float32))
    # cross-attention K/V once per layer
    cross = []
    for i in range(decoder.depth):
        lp = p[f"layer{i}"]["cross_attn"]
        k = _d(lp["k"], memory).reshape(B, -1, H, Dh).transpose(0, 2, 1, 3)
        v = _d(lp["v"], memory).reshape(B, -1, H, Dh).transpose(0, 2, 1, 3)
        cross.append((k, v))

    emb = p["token_emb"]["embedding"]
    pos = p["pos_emb"]
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))

    cache_k = jnp.zeros((decoder.depth, B, H, max_length, Dh), jnp.float32)
    cache_v = jnp.zeros_like(cache_k)
    ids0 = jnp.full((B, max_length), 0, jnp.int32).at[:, 0].set(bos_id)
    finished0 = jnp.zeros((B,), bool)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def one_token(x, ck, cv, t):
        """x: [B, D] embedding of token at position t; returns logits and
        updated caches."""
        new_ck, new_cv = [], []
        for i in range(decoder.depth):
            lp = p[f"layer{i}"]
            h = _ln(lp["norm1"], x)
            qkv = _d(lp["self_attn"]["qkv"], h)  # [B, 3D]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, H, 1, Dh)
            k = k.reshape(B, H, 1, Dh)
            v = v.reshape(B, H, 1, Dh)
            ck_i = jax.lax.dynamic_update_slice(ck[i], k, (0, 0, t, 0))
            cv_i = jax.lax.dynamic_update_slice(cv[i], v, (0, 0, t, 0))
            att = jnp.einsum("bhod,bhld->bhl", q, ck_i) * scale
            att = jnp.where(jnp.arange(max_length)[None, None, :] <= t,
                            att, -1e30)
            w = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bhl,bhld->bhd", w, cv_i).reshape(B, D)
            x = x + _d(lp["self_attn"]["proj"], o)

            h = _ln(lp["norm2"], x)
            q = _d(lp["cross_attn"]["q"], h).reshape(B, H, 1, Dh)
            kx, vx = cross[i]
            att = jnp.einsum("bhod,bhld->bhl", q, kx) * scale
            w = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bhl,bhld->bhd", w, vx).reshape(B, D)
            x = x + _d(lp["cross_attn"]["proj"], o)

            h = _ln(lp["norm3"], x)
            m = jax.nn.gelu(_d(lp["mlp"]["fc1"], h))
            x = x + _d(lp["mlp"]["fc2"], m)
            new_ck.append(ck_i)
            new_cv.append(cv_i)
        x = _ln(p["norm"], x)
        logits = _d(p["lm_head"], x)  # [B, V]
        return logits, jnp.stack(new_ck), jnp.stack(new_cv)

    def step(carry, t):
        ids, finished, ck, cv, rng_k = carry
        tok = _ln(p["embed_norm"], (emb[ids[:, t]] + pos[t]).astype(jnp.float32))
        logits, ck, cv = one_token(tok, ck, cv, t)
        if temperature > 0.0:
            rng_k, sub = jax.random.split(rng_k)
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, 0, nxt).astype(jnp.int32)
        ids = ids.at[:, t + 1].set(nxt)
        finished = finished | (nxt == eos_id)
        return (ids, finished, ck, cv, rng_k), None

    (ids, _, _, _, _), _ = jax.lax.scan(
        step, (ids0, finished0, cache_k, cache_v, rng),
        jnp.arange(max_length - 1),
    )
    return ids
