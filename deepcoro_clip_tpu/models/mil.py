"""Multi-instance linear probing heads over frozen embeddings.

Behavioral parity with the reference ``MultiInstanceLinearProbing``
(reference: models/multi_instance_linear_probing.py:82-544):

- pooling modes over instances: ``mean`` / ``max`` / ``attention`` (gated
  tanh*sigmoid attention, :493-507) / ``cls_token`` (learnable CLS +
  transformer with separate within-video and across-video stages, :351-478) /
  hybrids ``mean+cls_token`` and ``attention+cls_token`` (concatenated -> 2D
  head input, :192-201, :328-349);
- hierarchical 4D input ``[B, N, L, D]``: two-level pooling — within-video
  tokens then across videos (:360-433, :509-536);
- EchoJEPA-style view embeddings ``Embed(num_view_classes+1, D)`` with a PAD
  id (:141-145, :264-269);
- one Linear head per task (:196-201), Xavier init (:538-544).

Returns a dict ``{head_name: logits [B, n_outputs]}``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.models.layers import TransformerBlock, dense
from deepcoro_clip_tpu.registry import ModelRegistry

NEG = -1e30


class GatedAttentionPool(nn.Module):
    """Ilse et al. gated attention MIL pooling (reference :493-507)."""

    dim: int
    hidden: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        """x: [B, N, D]; mask: [B, N] -> ([B, D], attention [B, N])."""
        h = jnp.tanh(dense(self.hidden, dtype=self.dtype, name="V")(x))
        g = jax.nn.sigmoid(dense(self.hidden, dtype=self.dtype, name="U")(x))
        scores = dense(1, dtype=self.dtype, name="w")(h * g)[..., 0]  # [B, N]
        scores = scores.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG)
        att = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            any_valid = jnp.any(mask, axis=-1, keepdims=True)
            att = jnp.where(any_valid, att, jnp.ones_like(att) / att.shape[-1])
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        pooled = jnp.einsum("bn,bnd->bd", att.astype(x.dtype), x)
        return pooled, att


class CLSPool(nn.Module):
    """Learnable CLS + transformer over instances (reference :351-478)."""

    dim: int
    num_heads: int = 8
    depth: int = 1
    dropout: float = 0.0
    pre_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        B, N, D = x.shape
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, D), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(x.dtype), x], axis=1
        )
        if mask is not None:
            mask = jnp.concatenate([jnp.ones((B, 1), mask.dtype), mask], axis=1)
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, self.num_heads, dropout=self.dropout, dtype=self.dtype,
                use_flash=self.use_flash, name=f"block{i}",
            )(x, kv_mask=mask, deterministic=deterministic)
        out = x[:, 0]
        if not self.pre_norm:
            return out
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(out).astype(x.dtype)


@ModelRegistry.register("multi_instance_linear_probing")
class MultiInstanceLinearProbing(nn.Module):
    embedding_dim: int = 512
    head_structure: Dict[str, int] = None  # head -> n_outputs
    pooling_mode: str = "attention"
    attention_hidden: int = 256
    dropout: float = 0.0
    dropout_attention: float = 0.0
    num_heads: int = 8
    cls_depth: int = 1
    separate_video_attention: bool = True
    normalization_strategy: str = "pre_norm"
    use_view_embeddings: bool = False
    num_view_classes: int = 0
    hierarchical: bool = False  # input [B, N, L, D]
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    def _make_pools(self, scope: str) -> Dict[str, nn.Module]:
        """Instantiate the pooling submodules for one level. Reusing the SAME
        dict for both hierarchy levels shares weights (the reference's
        separate_video_attention=False behavior, :351-478)."""
        mode = self.pooling_mode
        pools: Dict[str, nn.Module] = {}
        if "attention" in mode:
            pools["gated"] = GatedAttentionPool(
                self.embedding_dim, self.attention_hidden,
                self.dropout_attention, self.dtype, name=f"{scope}_gated",
            )
        if "cls_token" in mode:
            pools["cls"] = CLSPool(
                self.embedding_dim, self.num_heads, self.cls_depth,
                self.dropout_attention,
                pre_norm=self.normalization_strategy == "pre_norm",
                dtype=self.dtype, use_flash=self.use_flash,
                name=f"{scope}_cls",
            )
        return pools

    def _pool(self, pools, x, mask, deterministic, sow_name: str):
        """[B, N, D] -> [B, D or 2D] by pooling_mode."""
        mode = self.pooling_mode
        parts = []
        if mode in ("mean", "mean+cls_token"):
            if mask is not None:
                m = mask.astype(x.dtype)[..., None]
                parts.append((x * m).sum(1) / jnp.maximum(m.sum(1), 1.0))
            else:
                parts.append(x.mean(1))
        if mode == "max":
            masked = jnp.where(mask[..., None], x, NEG) if mask is not None else x
            parts.append(masked.max(axis=1))
        if "gated" in pools:
            pooled, att = pools["gated"](x, mask, deterministic)
            self.sow("intermediates", f"{sow_name}_attention", att)
            parts.append(pooled)
        if "cls" in pools:
            parts.append(pools["cls"](x, mask, deterministic))
        if not parts:
            raise ValueError(f"unknown pooling_mode {self.pooling_mode!r}")
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        view_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """x: [B, N, D] per-video embeddings or [B, N, L, D] hierarchical
        tokens; mask: [B, N]; view_ids: [B, N] ints (PAD = num_view_classes).
        """
        if self.separate_video_attention:
            within_pools = self._make_pools("within")
            across_pools = self._make_pools("across")
        else:
            within_pools = across_pools = self._make_pools("shared")

        if x.ndim == 4:
            # level 1: pool tokens within each video (reference :360-433)
            B, N, L, D = x.shape
            flat = x.reshape(B * N, L, D)
            pooled = self._pool(within_pools, flat, None, deterministic, "within")
            if pooled.shape[-1] != D:  # hybrid doubles dim; reduce back
                pooled = dense(D, dtype=self.dtype, name="hier_proj")(pooled)
            x = pooled.reshape(B, N, D)

        if self.use_view_embeddings and view_ids is not None:
            emb = nn.Embed(
                self.num_view_classes + 1, self.embedding_dim,
                param_dtype=jnp.float32, name="view_embeddings",
            )(jnp.clip(view_ids, 0, self.num_view_classes))
            x = x + emb.astype(x.dtype)

        pooled = self._pool(across_pools, x, mask, deterministic, "across")
        # study-level embedding = the heads' input (the reference captures it
        # via a forward hook, runners/linear_probing_runner.py:700-718)
        self.sow("intermediates", "pooled", pooled)
        pooled = nn.Dropout(self.dropout)(pooled, deterministic=deterministic)

        out = {}
        for head, n_out in (self.head_structure or {}).items():
            out[head] = dense(
                n_out, dtype=jnp.float32, name=f"head_{head}"
            )(pooled.astype(jnp.float32))
        return out
