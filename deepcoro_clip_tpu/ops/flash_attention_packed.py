"""Packed-layout Pallas flash attention: heads live in 128-lane tiles.

The standard kernel (ops/flash_attention.py) takes ``[B, H, L, Dh]`` — the
layout every framework inherits from CUDA attention — which forces XLA to
materialize a real HBM transpose on each side of the custom call (Pallas
operands cannot fuse): ``[B, L, H*Dh] -> transpose -> kernel -> transpose ->
[B, L, H*Dh]``, and the same again for dq/dk/dv in the backward. On TPU the
transposes are pure overhead: when ``Dh`` is a multiple of 128, head ``h``
of a ``[B, L, H*Dh]`` activation is ALREADY a contiguous block of lane
tiles, so the kernel can slice heads out of the packed feature axis for
free (lane-tile-aligned slices) and read/write activations in exactly the
layout the surrounding matmuls produce and consume.

This module implements that: q/k/v are ``[B, L, D]`` with ``D = H*Dh``,
``Dh % 128 == 0``. The kernel grid is ``(B * H/Hb, num_q_blocks)``; each
program holds a block of ``Hb`` heads (``Hb*Dh`` lanes) and loops over them
with static lane slices. Block/VMEM shapes follow the same budget rules as
the standard kernel. Because q, k and v usually come from ONE fused QKV
projection, ``flash_attention_packed`` also accepts the undivided
``[B, L, 3D]`` tensor via ``qkv=``: the three operands are then block-spec
views at lane offsets 0/D/2D of the SAME array — no q/k/v slice buffers
are ever materialized in HBM.

Math (exact softmax per q-block, fp32 statistics, fused RoPE, Dao-style
backward with fp32 dk/dv accumulators) is identical to the standard
kernel; parity is pinned in tests/ops/test_flash_attention_packed.py.

Reference role: the attention inside every tower block (reference
models/video_encoder.py:259-388 uses torch SDPA with a [B, H, L, Dh]
permute on both sides — the pattern this layout removes).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepcoro_clip_tpu.ops.attention import multi_head_attention
from deepcoro_clip_tpu.ops.flash_attention import (
    softmax_base,
    NEG_INF,
    VMEM_BUDGET,
    _pad_axis,
    _rot,
    _unrot,
)

LANE = 128


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #


def _fwd_kernel(*refs, scale, causal, has_rope, has_mask, block_q, hb, dh):
    it = iter(refs)
    _exp, _fold = softmax_base()  # trace-time env read
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    if has_rope:
        qsin_ref, qcos_ref, ksin_ref, kcos_ref = (
            next(it), next(it), next(it), next(it),
        )
    if has_mask:
        mask_ref = next(it)
    o_ref = next(it)

    q_all = q_ref[0]  # [bq, Hb*Dh]
    k_all = k_ref[0]  # [Lk, Hb*Dh]
    v_all = v_ref[0]

    if has_mask:
        valid = mask_ref[0] != 0.0  # [1, Lk]
    if causal:
        iq = pl.program_id(1)

    for h in range(hb):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_all[:, sl]  # [bq, Dh] — lane-tile-aligned slice
        k = k_all[:, sl]  # [Lk, Dh]

        if has_rope:
            q = _rot(q, qsin_ref[...].astype(q.dtype),
                     qcos_ref[...].astype(q.dtype))
            k = _rot(k, ksin_ref[...].astype(k.dtype),
                     kcos_ref[...].astype(k.dtype))

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * _fold)  # [bq, Lk] (softmax_base: exp2 log2-fold)

        if has_mask:
            s = jnp.where(valid, s, NEG_INF)
        if causal:
            row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row >= col, s, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = _exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

        o = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _fwd_proj_kernel(*refs, scale, causal, has_rope, has_mask, block_q, hb,
                     dh, nhb):
    """Fused-epilogue forward: attention + per-head output projection.

    Identical attention math to ``_fwd_kernel``; additionally each head's
    output tile is multiplied by its slice of the output-projection kernel
    ``wo`` and accumulated into a fp32 scratch that persists across the
    head-block grid dimension (the y output block is revisited nhb times —
    partial sums are written every visit, the last visit completes them).
    Closes the XLA fusion boundary between the attention custom call and
    the projection dot (docs/KERNELS.md "scan idle gap"; ~24 of the 26
    per-step Pallas prologue gaps)."""
    it = iter(refs)
    _exp, _fold = softmax_base()  # trace-time env read
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    if has_rope:
        qsin_ref, qcos_ref, ksin_ref, kcos_ref = (
            next(it), next(it), next(it), next(it),
        )
    if has_mask:
        mask_ref = next(it)
    wo_ref = next(it)
    o_ref = next(it)
    y_ref = next(it)
    acc_ref = next(it)

    q_all = q_ref[0]  # [bq, Hb*Dh]
    k_all = k_ref[0]  # [Lk, Hb*Dh]
    v_all = v_ref[0]

    if has_mask:
        valid = mask_ref[0] != 0.0  # [1, Lk]
    iq = pl.program_id(1)
    hblk = jax.lax.rem(pl.program_id(0), nhb)

    contrib = None
    for h in range(hb):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_all[:, sl]
        k = k_all[:, sl]

        if has_rope:
            q = _rot(q, qsin_ref[...].astype(q.dtype),
                     qcos_ref[...].astype(q.dtype))
            k = _rot(k, ksin_ref[...].astype(k.dtype),
                     kcos_ref[...].astype(k.dtype))

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * _fold)

        if has_mask:
            s = jnp.where(valid, s, NEG_INF)
        if causal:
            row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row >= col, s, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = _exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

        o = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ob = (o / l).astype(o_ref.dtype)
        o_ref[0, :, sl] = ob  # attention residual (bwd input), as before
        # epilogue: this head's slice of the projection (bf16 x bf16 on
        # the MXU, fp32 accumulate — the XLA dot's own contraction math)
        part = jax.lax.dot_general(
            ob, wo_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, Dout]
        contrib = part if contrib is None else contrib + part

    rows = pl.dslice(iq * block_q, block_q)
    prior = acc_ref[rows, :]
    acc = jnp.where(hblk == 0, contrib, contrib + prior)
    acc_ref[rows, :] = acc
    y_ref[0] = acc.astype(y_ref.dtype)


# --------------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------------- #


def _bwd_kernel(*refs, scale, causal, has_rope, has_mask, block_q, hb, dh):
    it = iter(refs)
    _exp, _fold = softmax_base()  # trace-time env read
    q_ref, k_ref, v_ref, do_ref, o_ref = (
        next(it), next(it), next(it), next(it), next(it),
    )
    if has_rope:
        qsin_ref, qcos_ref, ksin_ref, kcos_ref = (
            next(it), next(it), next(it), next(it),
        )
    if has_mask:
        mask_ref = next(it)
    dq_ref = next(it)
    dk_ref = next(it)
    dv_ref = next(it)
    dk_acc = next(it)
    dv_acc = next(it)

    iq = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_all = q_ref[0]    # [bq, Hb*Dh]
    k_all = k_ref[0]    # [Lk, Hb*Dh]
    v_all = v_ref[0]
    do_all = do_ref[0]  # [bq, Hb*Dh]
    o_all = o_ref[0]    # [bq, Hb*Dh] (out residual; delta computed in-kernel)

    if has_mask:
        valid = mask_ref[0] != 0.0

    for h in range(hb):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_all[:, sl]
        k = k_all[:, sl]
        v = v_all[:, sl]
        do = do_all[:, sl]

        if has_rope:
            qsin = qsin_ref[...]
            qcos = qcos_ref[...]
            ksin = ksin_ref[...]
            kcos = kcos_ref[...]
            q = _rot(q, qsin.astype(q.dtype), qcos.astype(q.dtype))
            k = _rot(k, ksin.astype(k.dtype), kcos.astype(k.dtype))

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * _fold)  # [bq, Lk] (softmax_base: exp2 log2-fold)
        if has_mask:
            s = jnp.where(valid, s, NEG_INF)
        if causal:
            row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row >= col, s, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        e = _exp(s - m)
        l = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        p = e / l  # matches fwd semantics exactly

        pb = p.astype(v.dtype)
        dv_acc[:, sl] += jax.lax.dot_general(
            pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Lk, Dh]
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, Lk]
        # delta = rowsum(do * out) for this head, computed in-kernel: a
        # host-side [B, H, Lq, 1] fp32 delta operand has a 1-lane minor dim
        # whose layout materialization profiled at 3.4 GiB/s VMEM writes.
        delta = jnp.sum(
            do.astype(jnp.float32) * o_all[:, sl].astype(jnp.float32),
            axis=-1, keepdims=True,
        )  # [bq, 1] fp32
        ds = (p * (dp - delta) * scale).astype(q.dtype)

        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, Dh] fp32
        if has_rope:
            dq = _unrot(dq, qsin, qcos)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)

        dk_acc[:, sl] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Lk, Dh]

    @pl.when(iq == nq - 1)
    def _():
        dkr = dk_acc[...]
        if has_rope:
            ksin = ksin_ref[...]
            kcos = kcos_ref[...]
            for h in range(hb):
                sl = slice(h * dh, (h + 1) * dh)
                dk_ref[0, :, sl] = _unrot(
                    dkr[:, sl], ksin, kcos).astype(dk_ref.dtype)
        else:
            dk_ref[0] = dkr.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# --------------------------------------------------------------------------- #
# pallas_call assembly
# --------------------------------------------------------------------------- #


def _rope_specs(block_q, Lk, dh):
    return [
        pl.BlockSpec((block_q, dh), lambda g, i: (i, 0)),
        pl.BlockSpec((block_q, dh), lambda g, i: (i, 0)),
        pl.BlockSpec((Lk, dh), lambda g, i: (0, 0)),
        pl.BlockSpec((Lk, dh), lambda g, i: (0, 0)),
    ]


def _specs(nhb, hd, block_q, Lk, dh, has_rope, has_mask, q_blk, k_blk, v_blk):
    specs = [
        pl.BlockSpec((1, block_q, hd),
                     lambda g, i: (g // nhb, i, q_blk + g % nhb)),
        pl.BlockSpec((1, Lk, hd),
                     lambda g, i: (g // nhb, 0, k_blk + g % nhb)),
        pl.BlockSpec((1, Lk, hd),
                     lambda g, i: (g // nhb, 0, v_blk + g % nhb)),
    ]
    if has_rope:
        specs += _rope_specs(block_q, Lk, dh)
    if has_mask:
        specs += [pl.BlockSpec((1, 1, Lk), lambda g, i: (g // nhb, 0, 0))]
    return specs


def _fwd(qa, ka, va, extras, *, B, H, Lq, Lk, D, dh, hb, block_q, causal,
         scale, has_rope, has_mask, interpret, q_blk, k_blk, v_blk):
    nhb = H // hb
    hd = hb * dh
    nq = Lq // block_q
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, has_rope=has_rope,
        has_mask=has_mask, block_q=block_q, hb=hb, dh=dh,
    )
    return pl.pallas_call(
        kernel,
        grid=(B * nhb, nq),
        in_specs=_specs(nhb, hd, block_q, Lk, dh, has_rope, has_mask,
                        q_blk, k_blk, v_blk),
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g // nhb, i,
                                                               g % nhb)),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), qa.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * dh,
            bytes_accessed=(B * (Lq + 2 * Lk) * D) * qa.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(qa, ka, va, *extras)


def _fwd_proj(qa, ka, va, wo, extras, *, B, H, Lq, Lk, D, dh, hb, block_q,
              causal, scale, has_rope, has_mask, interpret, q_blk, k_blk,
              v_blk):
    """Fused attention+projection forward -> (y [B,Lq,Dout], out [B,Lq,D])."""
    nhb = H // hb
    hd = hb * dh
    nq = Lq // block_q
    dout = wo.shape[1]
    kernel = functools.partial(
        _fwd_proj_kernel, scale=scale, causal=causal, has_rope=has_rope,
        has_mask=has_mask, block_q=block_q, hb=hb, dh=dh, nhb=nhb,
    )
    in_specs = _specs(nhb, hd, block_q, Lk, dh, has_rope, has_mask,
                      q_blk, k_blk, v_blk)
    in_specs += [pl.BlockSpec((hd, dout), lambda g, i: (g % nhb, 0))]
    return pl.pallas_call(
        kernel,
        grid=(B * nhb, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda g, i: (g // nhb, i,
                                                         g % nhb)),
            # y is revisited across the head-block grid positions (index
            # map ignores g % nhb): partial sums out of the fp32 scratch
            # are written on every visit, the last visit completes them —
            # grid dim 0 must therefore iterate sequentially ("arbitrary")
            pl.BlockSpec((1, block_q, dout), lambda g, i: (g // nhb, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, D), qa.dtype),
            jax.ShapeDtypeStruct((B, Lq, dout), qa.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Lq, dout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * dh + 2 * B * Lq * D * dout,
            bytes_accessed=(B * (2 * Lq + 2 * Lk) * D) * qa.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(qa, ka, va, *extras, wo)


def _bwd(qa, ka, va, do, out, extras, *, B, H, Lq, Lk, D, dh, hb, block_q,
         causal, scale, has_rope, has_mask, interpret, q_blk, k_blk, v_blk):
    nhb = H // hb
    hd = hb * dh
    nq = Lq // block_q
    in_specs = _specs(nhb, hd, block_q, Lk, dh, has_rope, has_mask,
                      q_blk, k_blk, v_blk)
    # do and out mirror q's packed layout (their own arrays, offset 0);
    # delta is derived from them in-kernel
    in_specs.insert(3, pl.BlockSpec((1, block_q, hd),
                                    lambda g, i: (g // nhb, i, g % nhb)))
    in_specs.insert(4, pl.BlockSpec((1, block_q, hd),
                                    lambda g, i: (g // nhb, i, g % nhb)))
    kernel = functools.partial(
        _bwd_kernel, scale=scale, causal=causal, has_rope=has_rope,
        has_mask=has_mask, block_q=block_q, hb=hb, dh=dh,
    )
    args = [qa, ka, va, do, out, *extras]
    return pl.pallas_call(
        kernel,
        grid=(B * nhb, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda g, i: (g // nhb, i,
                                                         g % nhb)),
            pl.BlockSpec((1, Lk, hd), lambda g, i: (g // nhb, 0, g % nhb)),
            pl.BlockSpec((1, Lk, hd), lambda g, i: (g // nhb, 0, g % nhb)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, D), qa.dtype),
            jax.ShapeDtypeStruct((B, Lk, D), qa.dtype),
            jax.ShapeDtypeStruct((B, Lk, D), qa.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lk, hd), jnp.float32),
            pltpu.VMEM((Lk, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Lq * Lk * dh,
            bytes_accessed=(B * (4 * Lq + 4 * Lk) * D) * qa.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(*args)


@functools.lru_cache(maxsize=64)
def _make_fa(B, H, Lq, Lk, D, dh, hb, block_q, causal, scale, has_rope,
             has_mask, interpret, fused_qkv, bwd_impl):
    """custom-vjp packed flash attention for one static configuration.

    ``fused_qkv``: q/k/v operand slots all receive the SAME [B, L, 3D] array;
    block specs select lane offsets 0/D/2D (only legal for self-attention
    with Lq == Lk)."""
    hd = hb * dh
    if fused_qkv:
        q_blk, k_blk, v_blk = 0, D // hd, 2 * D // hd
    else:
        q_blk = k_blk = v_blk = 0

    common = dict(B=B, H=H, Lq=Lq, Lk=Lk, D=D, dh=dh, hb=hb, block_q=block_q,
                  causal=causal, scale=scale, has_rope=has_rope,
                  has_mask=has_mask, interpret=interpret,
                  q_blk=q_blk, k_blk=k_blk, v_blk=v_blk)

    @jax.custom_vjp
    def fa(qa, ka, va, *extras):
        return _fwd(qa, ka, va, extras, **common)

    def fwd(qa, ka, va, *extras):
        out = fa(qa, ka, va, *extras)
        return out, (qa, ka, va, out) + extras

    def bwd_pallas(res, g):
        qa, ka, va, out = res[:4]
        extras = res[4:]
        g = g.astype(qa.dtype)
        dq, dk, dv = _bwd(qa, ka, va, g, out, extras, **common)
        zeros = tuple(jnp.zeros_like(e) for e in extras)
        if fused_qkv:
            # cotangent for the single shared QKV array: place dq/dk/dv at
            # their lane offsets (the two zero slots fold away in XLA)
            dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
            z = jnp.zeros_like(dqkv)
            return (dqkv, z, z) + zeros
        return (dq, dk, dv) + zeros

    def bwd_xla(res, g):
        qa, ka, va, _ = res[:4]
        extras = res[4:]
        qsin, qcos = (extras[0], extras[1]) if has_rope else (None, None)
        mask = extras[-1] if has_mask else None

        def ref(a, b, c):
            if fused_qkv:
                a, b, c = (a[..., :D], a[..., D:2 * D], a[..., 2 * D:])
            qh = a.reshape(B, Lq, H, dh).transpose(0, 2, 1, 3)
            kh = b.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
            vh = c.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
            m = (mask[:, 0, :] != 0.0) if mask is not None else None
            out = multi_head_attention(qh, kh, vh, sin=qsin, cos=qcos,
                                       kv_mask=m, causal=causal, scale=scale)
            return out.transpose(0, 2, 1, 3).reshape(B, Lq, D)

        _, vjp = jax.vjp(ref, qa, ka, va)
        dq, dk, dv = vjp(g.astype(jnp.float32).astype(qa.dtype))
        zeros = tuple(jnp.zeros_like(e) for e in extras)
        return (dq.astype(qa.dtype), dk.astype(ka.dtype),
                dv.astype(va.dtype)) + zeros

    fa.defvjp(fwd, bwd_pallas if bwd_impl == "pallas" else bwd_xla)
    return fa


@functools.lru_cache(maxsize=64)
def _make_fa_proj(B, H, Lq, Lk, D, dh, hb, block_q, causal, scale, has_rope,
                  has_mask, interpret, fused_qkv):
    """custom-vjp fused attention+output-projection (packed layout).

    Forward: one Pallas call emits both the projected output ``y`` and the
    per-head attention output ``out`` (the bwd residual). Backward reuses
    the standard packed bwd kernel unchanged: ``do = g @ wo.T`` and
    ``dwo = out^T g`` are plain XLA dots — exactly the two dots XLA's own
    autodiff of the separate projection would emit, so the bwd program's
    boundary count is unchanged while the fwd loses one fusion boundary
    per layer."""
    hd = hb * dh
    if fused_qkv:
        q_blk, k_blk, v_blk = 0, D // hd, 2 * D // hd
    else:
        q_blk = k_blk = v_blk = 0

    common = dict(B=B, H=H, Lq=Lq, Lk=Lk, D=D, dh=dh, hb=hb, block_q=block_q,
                  causal=causal, scale=scale, has_rope=has_rope,
                  has_mask=has_mask, interpret=interpret,
                  q_blk=q_blk, k_blk=k_blk, v_blk=v_blk)

    @jax.custom_vjp
    def fap(qa, ka, va, wo, *extras):
        out_attn, y = _fwd_proj(qa, ka, va, wo, extras, **common)
        del out_attn
        return y

    def fwd(qa, ka, va, wo, *extras):
        out_attn, y = _fwd_proj(qa, ka, va, wo, extras, **common)
        return y, (qa, ka, va, wo, out_attn) + extras

    def bwd(res, gy):
        qa, ka, va, wo, out_attn = res[:5]
        extras = res[5:]
        gy = gy.astype(qa.dtype)
        # unproject the cotangent: do = gy @ wo^T  [B, Lq, D]
        do = jax.lax.dot_general(
            gy, wo, dimension_numbers=(((2,), (1,)), ((), ())),
        ).astype(qa.dtype)
        dq, dk, dv = _bwd(qa, ka, va, do, out_attn, extras, **common)
        # dwo = sum_{B,Lq} out^T gy  [D, Dout] (fp32 accumulate)
        dwo = jax.lax.dot_general(
            out_attn, gy, dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(wo.dtype)
        zeros = tuple(jnp.zeros_like(e) for e in extras)
        if fused_qkv:
            dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
            z = jnp.zeros_like(dqkv)
            return (dqkv, z, z, dwo) + zeros
        return (dq, dk, dv, dwo) + zeros

    fap.defvjp(fwd, bwd)
    return fap


# --------------------------------------------------------------------------- #
# public wrapper
# --------------------------------------------------------------------------- #


def _choose_packed(H, lq_pad, lk_pad, dh, block_q, itemsize=2, proj_dout=0):
    """(Hb, bq) under the VMEM budget. Per-head score tiles don't scale with
    Hb, so prefer the largest head-block, then the largest q block.
    ``proj_dout``: fused output-projection width (0 = standard kernel);
    adds the fp32 y-accumulator scratch, the wo block and the y block to
    the budget. Returns None when no fused config fits (caller falls back
    to the unfused kernel + XLA dot)."""
    best = None
    for hb in [d for d in range(1, H + 1) if H % d == 0]:
        hd = hb * dh
        for bq in (512, 256, 128, 64):
            if bq > block_q or bq > lq_pad:
                continue
            padded_lq = int(np.ceil(lq_pad / bq) * bq)
            waste = padded_lq / lq_pad
            if waste > 1.25:
                continue
            kv = 2 * lk_pad * hd * itemsize * 2      # k+v, double-buffered
            scratch = 2 * lk_pad * hd * 4            # fp32 dk/dv acc (bwd)
            tiles = 3 * bq * lk_pad * 4              # s/dp/ds fp32, one head
            qo = 4 * bq * hd * itemsize + 2 * bq * hd * 4
            proj = (padded_lq * proj_dout * 4            # fp32 y accumulator
                    + hd * proj_dout * itemsize * 2      # wo block (dbuf)
                    + 2 * bq * proj_dout * itemsize)     # y block
            if kv + scratch + tiles + qo + proj > VMEM_BUDGET:
                continue
            key = (hb * bq / waste, hb, bq)
            if best is None or key > best[0]:
                best = (key, (hb, bq))
    if best is None:
        return None if proj_dout else (1, min(64, lq_pad))
    return best[1]


def flash_attention_packed(
    q: Optional[jax.Array] = None,
    k: Optional[jax.Array] = None,
    v: Optional[jax.Array] = None,
    *,
    qkv: Optional[jax.Array] = None,
    num_heads: int,
    sin: Optional[jax.Array] = None,
    cos: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 512,
    backend: str = "auto",  # auto | pallas | xla | interpret
    wo: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash attention over packed ``[B, L, H*Dh]`` activations.

    Either pass ``q``/``k``/``v`` (each ``[B, L, D]``), or a single fused
    ``qkv`` ``[B, L, 3D]`` (self-attention; q/k/v are lane views — nothing
    is sliced out in HBM). Requires ``Dh % 128 == 0``; callers fall back to
    ``flash_attention`` otherwise. Returns ``[B, Lq, D]``.

    ``wo`` (``[D, Dout]``): fuse the output projection into the kernel
    epilogue and return the PROJECTED ``[B, Lq, Dout]`` output instead
    (docs/KERNELS.md "scan idle gap"; bias stays with the caller). Falls
    back to kernel + XLA dot when the fused config exceeds the VMEM
    budget.
    """
    fused = qkv is not None
    if fused:
        B, Lq, D3 = qkv.shape
        D = D3 // 3
        Lk = Lq
        ref_dtype = qkv.dtype
    else:
        B, Lq, D = q.shape
        Lk = k.shape[1]
        ref_dtype = q.dtype
    H = num_heads
    dh = D // H
    if dh % LANE != 0:
        raise ValueError(f"packed attention requires Dh%128==0, got Dh={dh}")

    if wo is not None:
        if wo.shape[0] != D:
            raise ValueError(f"wo rows {wo.shape[0]} != D {D}")
        wo = wo.astype(ref_dtype)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "xla":
        if fused:
            q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
        qh = q.reshape(B, Lq, H, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Lk, H, dh).transpose(0, 2, 1, 3)
        m = (kv_mask != 0) if kv_mask is not None else None
        out = multi_head_attention(qh, kh, vh, sin=sin, cos=cos, kv_mask=m,
                                   causal=causal, scale=scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, D)
        if wo is not None:
            out = jax.lax.dot_general(
                out, wo, dimension_numbers=(((2,), (0,)), ((), ())))
        return out
    interpret = backend == "interpret"

    has_rope = sin is not None
    if has_rope and Lq != Lk:
        raise ValueError("RoPE packed attention requires self-attention")
    scale_v = float(scale if scale is not None else dh**-0.5)

    lq_pad = int(np.ceil(Lq / LANE) * LANE)
    lk_pad = int(np.ceil(Lk / LANE) * LANE)
    if has_rope:
        lq_pad = lk_pad = max(lq_pad, lk_pad)
    # fused output projection reuses the standard packed bwd kernel, which
    # only exists for the pallas bwd implementation
    fuse_proj = (wo is not None
                 and os.environ.get("DEEPCORO_FLASH_BWD", "pallas")
                 == "pallas")
    chosen = None
    if fuse_proj:
        chosen = _choose_packed(H, lq_pad, lk_pad, dh, block_q,
                                itemsize=ref_dtype.itemsize,
                                proj_dout=int(wo.shape[1]))
        fuse_proj = chosen is not None
    if chosen is None:
        chosen = _choose_packed(H, lq_pad, lk_pad, dh, block_q,
                                itemsize=ref_dtype.itemsize)
    hb, bq = chosen
    lq_pad = int(np.ceil(lq_pad / bq) * bq)
    if has_rope:
        lk_pad = lq_pad

    has_mask = kv_mask is not None or lk_pad != Lk
    maskf = None
    if has_mask:
        base = (kv_mask.astype(jnp.float32) if kv_mask is not None
                else jnp.ones((B, Lk), jnp.float32))
        maskf = _pad_axis(base, 1, lk_pad)[:, None, :]  # [B, 1, Lk]

    if fused:
        qkv_p = _pad_axis(qkv, 1, lq_pad)
        qa = ka = va = qkv_p
    else:
        qa = _pad_axis(q, 1, lq_pad)
        ka = _pad_axis(k, 1, lk_pad)
        va = _pad_axis(v, 1, lk_pad)

    extras = []
    if has_rope:
        sin_p = _pad_axis(sin.astype(jnp.float32), 0, lq_pad)
        pad_rows = lq_pad - sin.shape[0]
        cos_p = (jnp.concatenate(
            [cos.astype(jnp.float32),
             jnp.ones((pad_rows, dh), jnp.float32)], axis=0)
            if pad_rows > 0 else cos.astype(jnp.float32))
        extras += [sin_p, cos_p, sin_p, cos_p]
    if has_mask:
        extras += [maskf]

    if fuse_proj:
        fap = _make_fa_proj(B, H, lq_pad, lk_pad, D, dh, hb, bq, causal,
                            scale_v, has_rope, has_mask, interpret, fused)
        y = fap(qa, ka, va, wo, *extras)
        return y[:, :Lq, :]

    bwd_impl = os.environ.get("DEEPCORO_FLASH_BWD", "pallas")
    fa = _make_fa(B, H, lq_pad, lk_pad, D, dh, hb, bq, causal, scale_v,
                  has_rope, has_mask, interpret, fused, bwd_impl)
    out = fa(qa, ka, va, *extras)
    out = out[:, :Lq, :]
    if wo is not None:
        out = jax.lax.dot_general(
            out, wo, dimension_numbers=(((2,), (0,)), ((), ())))
    return out
