"""Reference (pure-XLA) multi-head attention with fused 3D RoPE.

This is the numerics oracle for the Pallas flash-attention kernel
(ops/flash_attention.py) and the CPU-backend fallback used in tests.
Softmax statistics are computed in fp32 regardless of the compute dtype,
mirroring the reference's fp32-forced attention discipline
(reference: models/video_encoder.py:543-563).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """x: [..., L, Dh]; sin/cos: [L, Dh] (broadcast over leading dims)."""
    sin = sin.astype(x.dtype)
    cos = cos.astype(x.dtype)
    return x * cos + rotate_half(x) * sin


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sin: Optional[jax.Array] = None,
    cos: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Scaled-dot-product attention.

    q, k, v: ``[B, H, L, Dh]`` (k/v may have different length Lk).
    sin/cos: optional RoPE tables ``[L, Dh]`` applied to q and k.
    kv_mask: optional bool ``[B, Lk]`` — True = attend.
    causal: autoregressive masking (captioning decoder).
    Returns ``[B, H, Lq, Dh]`` in q's dtype.
    """
    if sin is not None:
        q = apply_rope(q, sin, cos)
        k = apply_rope(k, sin, cos)
    dh = q.shape[-1]
    scale = scale if scale is not None else dh**-0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(kv_mask[:, None, None, :], logits, neg)
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        idx_q = jnp.arange(lq)[:, None]
        idx_k = jnp.arange(lk)[None, :]
        logits = jnp.where(idx_q >= idx_k, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
