"""Shared flax building blocks for the TPU-native model zoo.

Design rules (TPU-first):
- params fp32, compute bf16 (``dtype`` arg), softmax/norm statistics fp32 —
  replaces the reference's AMP + fp32-forced-backbone discipline
  (reference: models/video_encoder.py:543-563).
- Dense kernels carry ``nn.with_partitioning`` metadata so tensor parallelism
  over the mesh "model" axis is a sharding annotation, not new code
  (new capability vs the reference's DDP-only design, SURVEY.md §2.2).
- attention dispatches to the Pallas flash kernel on TPU
  (ops/flash_attention.py) and the XLA oracle on CPU.
"""

from __future__ import annotations

import os

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.ops.flash_attention import flash_attention
from deepcoro_clip_tpu.ops.flash_attention_packed import flash_attention_packed

Dtype = jnp.dtype


def epilogue_barrier(x):
    """Optionally split elementwise epilogues off the preceding matmul.

    XLA fuses residual-add / LayerNorm stats / GELU into the producing
    dot's output fusion; the step profile shows those fused dots at
    73-80 TF/s vs ~110+ for clean dots (docs/KERNELS.md). With
    ``DEEPCORO_EPILOGUE_BARRIER=1`` an ``optimization_barrier`` after the
    dot forces the epilogue into a separate (HBM-bound, cheap) loop fusion
    so the dot keeps the MXU to itself. Measurement knob, default off;
    the A/B lives in dev/epilogue_bench.py.
    """
    if os.environ.get("DEEPCORO_EPILOGUE_BARRIER", "0") == "1":
        return jax.lax.optimization_barrier(x)
    return x


def dense(
    features: int,
    partition: Tuple[Optional[str], Optional[str]] = (None, None),
    use_bias: bool = True,
    dtype=jnp.bfloat16,
    name: Optional[str] = None,
) -> nn.Dense:
    """Dense with fp32 params, requested compute dtype, and TP metadata."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.with_partitioning(
            nn.initializers.xavier_uniform(), partition
        ),
        name=name,
    )


class MlpBlock(nn.Module):
    """Transformer MLP: Dense -> GELU -> Dense, hidden sharded over 'model'."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = dense(self.hidden_dim, (None, "model"), dtype=self.dtype, name="fc1")(x)
        x = epilogue_barrier(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense(self.out_dim, ("model", None), dtype=self.dtype, name="fc2")(x)
        x = epilogue_barrier(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class _ProjParams(nn.Module):
    """Output-projection parameters WITHOUT the dot: the fused-epilogue
    attention path (DEEPCORO_FUSED_OUTPROJ=1) applies the kernel inside the
    Pallas call, so only the params are declared here — with the same
    names ("proj"/kernel+bias), initializers, dtype and partitioning as
    ``dense(name="proj")`` so checkpoints and shardings are identical
    whichever path a run compiles."""

    in_dim: int
    out_dim: int
    partition: Tuple[Optional[str], Optional[str]] = ("model", None)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.with_partitioning(nn.initializers.xavier_uniform(),
                                 self.partition),
            (self.in_dim, self.out_dim), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.out_dim,), jnp.float32)
        return kernel, bias


class Attention(nn.Module):
    """Multi-head self/cross attention on the flash kernel.

    RoPE tables (sin/cos, numpy or jax arrays of shape [L, head_dim]) are
    fused into the kernel. Heads are sharded over the 'model' mesh axis via
    the qkv/proj kernel partitioning.
    """

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    use_flash: bool = True
    # sequence parallelism: when a mesh is given, self-attention runs as
    # ring attention with the token axis sharded over ``ring_axis``
    # (parallel/ring_attention.py; NEW capability vs the reference)
    ring_mesh: Optional[object] = None
    ring_axis: str = "model"

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        sin=None,
        cos=None,
        kv_mask=None,
        causal: bool = False,
        deterministic: bool = True,
    ):
        head_dim = self.dim // self.num_heads
        ctx = x if context is None else context
        B, Lq, _ = x.shape
        Lk = ctx.shape[1]

        # packed layout: when Dh is a multiple of 128, heads are already
        # lane-tile blocks of the [B, L, D] activation — the packed kernel
        # reads the QKV projection output (and writes its own output) with
        # NO [B,L,H,Dh]<->[B,H,L,Dh] transposes materialized around the
        # Pallas call (ops/flash_attention_packed.py).
        use_packed = (
            self.use_flash and head_dim % 128 == 0 and self.ring_mesh is None
            and os.environ.get("DEEPCORO_PACKED_ATTN", "1") == "1"
        )

        if context is None:
            # fused QKV projection: one wide MXU matmul instead of three
            qkv = dense(3 * self.dim, (None, "model"), dtype=self.dtype,
                        name="qkv")(x)
            if use_packed:
                # fused output projection: the proj dot rides the flash
                # kernel's epilogue (one fewer fusion boundary per layer;
                # docs/KERNELS.md "scan idle gap"). Param tree is identical
                # to the dense path, so the knob never invalidates a
                # checkpoint.
                if os.environ.get("DEEPCORO_FUSED_OUTPROJ", "0") == "1":
                    wo, wb = _ProjParams(self.dim, self.dim,
                                         name="proj")()
                    out = flash_attention_packed(
                        qkv=qkv, num_heads=self.num_heads,
                        sin=None if sin is None else jnp.asarray(sin),
                        cos=None if cos is None else jnp.asarray(cos),
                        kv_mask=kv_mask, causal=causal,
                        wo=wo,
                    )
                    out = out + wb.astype(out.dtype)
                    out = epilogue_barrier(out)
                    return nn.Dropout(self.dropout)(
                        out, deterministic=deterministic)
                out = flash_attention_packed(
                    qkv=qkv, num_heads=self.num_heads,
                    sin=None if sin is None else jnp.asarray(sin),
                    cos=None if cos is None else jnp.asarray(cos),
                    kv_mask=kv_mask, causal=causal,
                )
                out = dense(self.dim, ("model", None), dtype=self.dtype,
                            name="proj")(out)
                out = epilogue_barrier(out)
                return nn.Dropout(self.dropout)(out,
                                                deterministic=deterministic)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(self.dim, (None, "model"), dtype=self.dtype, name="q")(x)
            k = dense(self.dim, (None, "model"), dtype=self.dtype, name="k")(ctx)
            v = dense(self.dim, (None, "model"), dtype=self.dtype, name="v")(ctx)
            if use_packed:
                out = flash_attention_packed(
                    q, k, v, num_heads=self.num_heads,
                    kv_mask=kv_mask, causal=causal,
                )
                out = dense(self.dim, ("model", None), dtype=self.dtype,
                            name="proj")(out)
                out = epilogue_barrier(out)
                return nn.Dropout(self.dropout)(out,
                                                deterministic=deterministic)

        def split(t, L):
            return t.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q, Lq), split(k, Lk), split(v, Lk)

        use_ring = (
            self.ring_mesh is not None and context is None and not causal
            and kv_mask is None
            and Lq % self.ring_mesh.shape[self.ring_axis] == 0
        )
        if use_ring:
            from deepcoro_clip_tpu.ops.attention import apply_rope
            from deepcoro_clip_tpu.parallel.ring_attention import ring_attention

            if sin is not None:
                s, c = jnp.asarray(sin), jnp.asarray(cos)
                q, k = apply_rope(q, s, c), apply_rope(k, s, c)
            out = ring_attention(q, k, v, self.ring_mesh, axis=self.ring_axis)
        else:
            backend = "auto" if self.use_flash else "xla"
            out = flash_attention(
                q, k, v,
                sin=None if sin is None else jnp.asarray(sin),
                cos=None if cos is None else jnp.asarray(cos),
                kv_mask=kv_mask,
                causal=causal,
                backend=backend,
            )
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.dim)
        out = dense(self.dim, ("model", None), dtype=self.dtype, name="proj")(out)
        out = epilogue_barrier(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    """Pre-LN transformer block (LN in fp32)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    use_flash: bool = True
    ring_mesh: Optional[object] = None
    ring_axis: str = "model"

    @nn.compact
    def __call__(
        self, x, sin=None, cos=None, kv_mask=None, deterministic: bool = True
    ):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + Attention(
            self.dim, self.num_heads, self.dropout, self.dtype, self.use_flash,
            ring_mesh=self.ring_mesh, ring_axis=self.ring_axis,
            name="attn",
        )(h, sin=sin, cos=cos, kv_mask=kv_mask, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + MlpBlock(
            int(self.dim * self.mlp_ratio), self.dim, self.dropout, self.dtype,
            name="mlp",
        )(h, deterministic=deterministic)
        return x


class ProjectionHead(nn.Module):
    """Dropout -> Linear -> GELU -> Dropout projection to the shared embedding
    space (reference: models/video_encoder.py:175-180, text_encoder.py:63-68)."""

    out_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense(self.out_dim, (None, None), dtype=self.dtype, name="proj")(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class _PatchProj(nn.Module):
    """Holds the patchify weights under the same names/shapes nn.Conv would
    (``kernel`` [pt,ph,pw,C,dim], ``bias`` [dim]) while applying them as a
    plain matmul over space-to-depth patches.

    When ``pixel_mean/pixel_std`` are set and the incoming patches are raw
    integer pixels, per-channel normalization is FOLDED INTO THE WEIGHTS:
    ((x-m)/s)@W + b == x@(W/s) + (b - sum((m/s)·W)). The fold is exact in
    fp32 and costs one tiny [K,dim] elementwise + reduction per step (fused
    by XLA), so the batch never materializes as normalized f32 in HBM
    (profiled 3.0 ms/step of convert+write at flagship B=16 otherwise).

    Grayscale wire (config.mono_wire): when the input carries ONE channel
    against a C-channel parameter tree, the input is a luma plane whose
    channel replication is folded too: with x_c == x for all c,
    sum_c ((x-m_c)/s_c)·W_c == x·sum_c(W_c/s_c) - sum_c((m_c/s_c)·W_c),
    i.e. the stats-folded kernel summed over its channel axis. Checkpoints
    stay 3-channel and bit-compatible with the RGB wire; the wire ships
    (and the host preprocesses) a third of the bytes. The reference loads
    grayscale DICOM luma replicated to RGB (utils/video.py:247-288), so
    for angiography sources this is lossless. Raw-integer wire only: a
    host-normalized float mono plane cannot represent per-channel stats."""

    dim: int
    patch: Tuple[int, int, int]
    in_channels: int
    dtype: Dtype
    pixel_mean: Optional[Tuple[float, ...]] = None
    pixel_std: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, patches, fold_stats: bool = False):
        # patches: [B, Tn, pt, Hn, ph, Wn, pw, C] device grid, or
        # pre-flattened [B, L, pt*ph*pw*C] (the host patch-major wire,
        # data/patch_wire.py — K ordering matches the kernel reshape below)
        pt, ph, pw = self.patch
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2, 3)),
            (pt, ph, pw, self.in_channels, self.dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        Cin = (patches.shape[-1] if patches.ndim != 3
               else patches.shape[-1] // (pt * ph * pw))
        # mono: 1-channel input against a C-channel tree. On a float wire
        # this assumes channel-uniform normalization — true by construction
        # for grayscale-replicated sources, the wire's documented contract.
        mono = Cin == 1 and self.in_channels > 1
        b = bias
        w = kernel
        if mono and not fold_stats:
            w = kernel.sum(axis=3, keepdims=True)
        if fold_stats:
            C = self.in_channels
            m = jnp.asarray(
                self.pixel_mean if self.pixel_mean is not None else (0.0,) * C,
                jnp.float32,
            )
            s = jnp.maximum(jnp.asarray(
                self.pixel_std if self.pixel_std is not None else (1.0,) * C,
                jnp.float32,
            ), 1e-6)
            if m.shape[0] != C:  # mono-computed stats against C-channel tree
                m = jnp.broadcast_to(m, (C,))
            if s.shape[0] != C:
                s = jnp.broadcast_to(s, (C,))
            # fold (x-m)/s into kernel/bias along the channel axis
            b = bias - jnp.einsum("c,thwcd->d", m / s, kernel)
            w = kernel / s[None, None, None, :, None]
            if mono:  # fold channel replication: x_c == x for all c
                w = w.sum(axis=3, keepdims=True)
        if patches.ndim == 3:
            # host patch-major wire: the layout change already happened on
            # the CPU (contiguous memcpy runs), so the device does ONE clean
            # [B, L, K] @ [K, dim] MXU dot — no strided uint8 operand copy
            # (profiled at 22.6 GiB/s / ~5.5 ms/step on the device path).
            wk = w.reshape(pt * ph * pw * w.shape[3], self.dim)
            y = jax.lax.dot_general(
                patches.astype(self.dtype), wk.astype(self.dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=self.dtype,
            )  # [B, L, dim]
            return y + b.astype(self.dtype)
        # unpermuted patch grid [B, Tn, pt, Hn, ph, Wn, pw, C]: contract the
        # scattered (pt, ph, pw, C) axes directly. XLA still schedules its
        # own operand copy (measured equal to an explicit transpose at
        # flagship shapes), but the intent is in one dot_general and any
        # future layout-aware lowering gets the whole pattern.
        y = jax.lax.dot_general(
            patches.astype(self.dtype), w.astype(self.dtype),
            dimension_numbers=(((2, 4, 6, 7), (0, 1, 2, 3)), ((), ())),
            preferred_element_type=self.dtype,
        )  # [B, Tn, Hn, Wn, dim]
        B, Tn, Hn, Wn, _ = y.shape
        return y.reshape(B, Tn * Hn * Wn, self.dim) + b.astype(self.dtype)


class PatchEmbed3D(nn.Module):
    """3D tubelet patchify: [B, T, H, W, C] -> [B, T'·H'·W', dim].

    Space-to-depth + one MXU matmul rather than a strided conv: XLA lowers
    the (2,16,16)-stride conv over the uint8-normalized input at <20 TF/s
    (profiled 4.6 ms/step fwd+bwd at flagship shapes), while the identical
    computation as reshape+dot runs at matmul speed. Parameter tree is
    exactly what nn.Conv(name="conv") would create, so checkpoints and
    param-group code see no difference. Replaces the reference's MViT
    conv_proj patchify (reference: models/video_encoder.py:232-253).

    uint8 wire: integer inputs stay uint8 through the space-to-depth
    transpose (1/4 the HBM traffic of transposing f32) and per-channel
    dataset normalization folds into the projection weights (see
    _PatchProj) — the reference normalizes on the host instead
    (utils/video.py:278-288).
    """

    dim: int
    patch: Tuple[int, int, int] = (2, 16, 16)
    dtype: Dtype = jnp.bfloat16
    pixel_mean: Optional[Tuple[float, ...]] = None
    pixel_std: Optional[Tuple[float, ...]] = None
    # static token grid (T', H', W') for the pre-flattened patch-major wire
    # ([B, L, K] uint8 from data/patch_wire.py) — the grid can't be inferred
    # from L alone and RoPE tables need it at trace time
    patch_grid: Optional[Tuple[int, int, int]] = None
    # PARAMETER channel count (kernel [pt,ph,pw,C,dim]); a 1-channel input
    # against in_channels > 1 is the grayscale wire (see _PatchProj)
    in_channels: int = 3

    @nn.compact
    def __call__(self, x):
        pt, ph, pw = self.patch
        if x.ndim == 3:  # host patch-major wire [B, L, K]
            if self.patch_grid is None:
                raise ValueError(
                    "patch-major input requires patch_grid=(T', H', W') "
                    "(set video_encoder patch_grid / config frames+resize)"
                )
            Tn, Hn, Wn = self.patch_grid
            assert x.shape[1] == Tn * Hn * Wn, (
                f"patch-wire token count {x.shape[1]} != grid {self.patch_grid}"
            )
            is_raw = jnp.issubdtype(x.dtype, jnp.integer)
            y = _PatchProj(
                self.dim, (pt, ph, pw), self.in_channels, self.dtype,
                pixel_mean=self.pixel_mean, pixel_std=self.pixel_std,
                name="conv",
            )(x, fold_stats=bool(is_raw))
            return y, (Tn, Hn, Wn)
        B, T, H, W, C = x.shape
        is_raw = jnp.issubdtype(x.dtype, jnp.integer)
        if T % pt or H % ph or W % pw:  # pad right to a whole patch grid
            if is_raw and self.pixel_mean is not None:
                # normalize BEFORE padding so zero padding means "dataset
                # mean" on the uint8 wire exactly as it does on the float
                # wire (raw-zero padding would normalize to -mean/std)
                m = jnp.asarray(self.pixel_mean, jnp.float32)
                s = jnp.maximum(jnp.asarray(self.pixel_std, jnp.float32), 1e-6)
                if C == 1 and m.shape[0] > 1:
                    # mono wire + non-divisible shapes: normalize with the
                    # (channel-uniform by construction) mono stats, then
                    # materialize the replication — correctness over wire
                    # savings on this unreachable-at-flagship corner
                    x = (x.astype(jnp.float32) - m[:1]) / s[:1]
                    x = jnp.repeat(x, self.in_channels, axis=-1)
                    C = self.in_channels
                else:
                    x = (x.astype(jnp.float32) - m) / s
                is_raw = False
            x = jnp.pad(x, ((0, 0), (0, -T % pt), (0, -H % ph),
                            (0, -W % pw), (0, 0)))
            T, H, W = x.shape[1:4]
        Tn, Hn, Wn = T // pt, H // ph, W // pw
        p = x.reshape(B, Tn, pt, Hn, ph, Wn, pw, C)
        y = _PatchProj(
            self.dim, (pt, ph, pw), self.in_channels, self.dtype,
            pixel_mean=self.pixel_mean, pixel_std=self.pixel_std,
            name="conv",
        )(p, fold_stats=bool(is_raw))
        return y, (Tn, Hn, Wn)
