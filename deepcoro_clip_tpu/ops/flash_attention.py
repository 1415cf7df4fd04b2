"""Pallas TPU flash attention with fused 3D RoPE.

Replaces the reference's cuDNN/SDPA attention inside MViT blocks (reference:
models/video_encoder.py:259-388, where 3D RoPE is monkey-patched into
torchvision's MultiScaleAttention). Here the RoPE rotation is fused into the
attention kernel: q/k tiles are rotated in VMEM right before the MXU dot.

Kernel shape
------------
grid = (B, H, num_q_blocks); the FULL K/V for one (batch, head) pair stays
resident in VMEM across q-block iterations (Pallas skips the DMA when the
block index map output is unchanged), so K/V are read from HBM exactly once
per (b, h).  With L up to ~32k tokens the [block_q, L] fp32 score tile fits
VMEM, so each q block does ONE exact softmax — no online rescaling, which
keeps eval numerics batch-size invariant (the reference's reproducibility
criterion, scripts/run_reproducibility_tests.py:1-8).  The L x L score matrix
is never materialised in HBM.

Backward: recompute through the pure-XLA oracle (ops/attention.py) under
``jax.custom_vjp``; a Pallas backward kernel is a planned optimisation.
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

NEG_INF = -1e30


def _flash_kernel(
    *refs,
    scale: float,
    causal: bool,
    has_rope: bool,
    has_mask: bool,
    block_q: int,
):
    it = iter(refs)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    if has_rope:
        qsin_ref, qcos_ref, ksin_ref, kcos_ref = next(it), next(it), next(it), next(it)
    if has_mask:
        mask_ref = next(it)
    o_ref = next(it)

    q = q_ref[0, 0]  # [block_q, Dh]
    k = k_ref[0, 0]  # [Lk, Dh]

    if has_rope:
        half = q.shape[-1] // 2

        def rot(x, sin_r, cos_r):
            sin = sin_r[...].astype(x.dtype)
            cos = cos_r[...].astype(x.dtype)
            xr = jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)
            return x * cos + xr * sin

        q = rot(q, qsin_ref, qcos_ref)
        k = rot(k, ksin_ref, kcos_ref)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [block_q, Lk] fp32

    if has_mask:
        valid = mask_ref[0] != 0.0  # [1, Lk]
        s = jnp.where(valid, s, NEG_INF)
    if causal:
        iq = pl.program_id(2)
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(row >= col, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

    v = v_ref[0, 0]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _flash_call(q, k, v, extras, *, causal, scale, block_q, has_rope, has_mask, interpret):
    B, H, _, Dh = q.shape
    Lq = q.shape[2]
    Lk = k.shape[2]
    nq = Lq // block_q

    in_specs = [
        pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, Lk, Dh), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Lk, Dh), lambda b, h, i: (b, h, 0, 0)),
    ]
    if has_rope:
        in_specs += [
            pl.BlockSpec((block_q, Dh), lambda b, h, i: (i, 0)),
            pl.BlockSpec((block_q, Dh), lambda b, h, i: (i, 0)),
            pl.BlockSpec((Lk, Dh), lambda b, h, i: (0, 0)),
            pl.BlockSpec((Lk, Dh), lambda b, h, i: (0, 0)),
        ]
    if has_mask:
        # [B, 1, Lk] so the last-two block dims equal the array dims (TPU
        # sublane/lane blocking rule)
        in_specs += [pl.BlockSpec((1, 1, Lk), lambda b, h, i: (b, 0, 0))]

    kernel = functools.partial(
        _flash_kernel,
        scale=scale, causal=causal, has_rope=has_rope, has_mask=has_mask,
        block_q=block_q,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, H, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * Dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(q, k, v, *extras)


def _flash_bwd_kernel(
    *refs,
    scale: float,
    causal: bool,
    has_rope: bool,
    has_mask: bool,
    block_q: int,
):
    """Flash-attention backward (Dao-style), whole-K/V resident per (b, h).

    dV = P^T dO; dP = dO V^T; dS = P * (dP - delta) * scale;
    dQ = dS K_rot; dK = dS^T Q_rot — with dK/dV accumulated in fp32 VMEM
    scratch across q-block grid steps and flushed on the last one. RoPE is
    re-applied to q/k in-kernel; dQ/dK are rotated BACK through the transpose
    rotation dx = g*cos - rotate_half(g*sin).
    """
    it = iter(refs)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    do_ref = next(it)
    delta_ref = next(it)
    if has_rope:
        qsin_ref, qcos_ref, ksin_ref, kcos_ref = next(it), next(it), next(it), next(it)
    if has_mask:
        mask_ref = next(it)
    dq_ref = next(it)
    dk_ref = next(it)
    dv_ref = next(it)
    dk_acc = next(it)
    dv_acc = next(it)

    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]      # [bq, Dh]
    k = k_ref[0, 0]      # [Lk, Dh]
    v = v_ref[0, 0]
    do = do_ref[0, 0]    # [bq, Dh]
    half = q.shape[-1] // 2

    def rh(x):
        return jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)

    if has_rope:
        qsin = qsin_ref[...].astype(q.dtype)
        qcos = qcos_ref[...].astype(q.dtype)
        ksin = ksin_ref[...].astype(k.dtype)
        kcos = kcos_ref[...].astype(k.dtype)
        q = q * qcos + rh(q) * qsin
        k = k * kcos + rh(k) * ksin

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, Lk]
    if has_mask:
        valid = mask_ref[0] != 0.0
        s = jnp.where(valid, s, NEG_INF)
    if causal:
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(row >= col, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / l  # normalized probs, identical to fwd semantics

    pb = p.astype(v.dtype)
    # dV += P^T dO
    dv_acc[...] += jax.lax.dot_general(
        pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = delta_ref[0, 0]  # [bq, 1] fp32
    ds = (p * (dp - delta) * scale).astype(q.dtype)  # [bq, Lk]

    dq_rot = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_rope:
        dq_rot = dq_rot.astype(jnp.float32)
        qs32 = qsin_ref[...]
        qc32 = qcos_ref[...]
        def rh32(x):
            return jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)
        dq = dq_rot * qc32 - rh32(dq_rot * qs32)
    else:
        dq = dq_rot
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    # dK_rot += dS^T Q_rot
    dk_acc[...] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _():
        dkr = dk_acc[...]
        if has_rope:
            ks32 = ksin_ref[...]
            kc32 = kcos_ref[...]
            dkk = dkr * kc32 - jnp.concatenate(
                [-(dkr * ks32)[:, half:], (dkr * ks32)[:, :half]], axis=1
            )
        else:
            dkk = dkr
        dk_ref[0, 0] = dkk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_call(q, k, v, do, delta, extras, *, causal, scale, block_q,
                    has_rope, has_mask, interpret):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    nq = Lq // block_q

    in_specs = [
        pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i: (b, h, i, 0)),  # q
        pl.BlockSpec((1, 1, Lk, Dh), lambda b, h, i: (b, h, 0, 0)),       # k
        pl.BlockSpec((1, 1, Lk, Dh), lambda b, h, i: (b, h, 0, 0)),       # v
        pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i: (b, h, i, 0)),  # do
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),   # delta
    ]
    args = [q, k, v, do, delta]
    if has_rope:
        in_specs += [
            pl.BlockSpec((block_q, Dh), lambda b, h, i: (i, 0)),
            pl.BlockSpec((block_q, Dh), lambda b, h, i: (i, 0)),
            pl.BlockSpec((Lk, Dh), lambda b, h, i: (0, 0)),
            pl.BlockSpec((Lk, Dh), lambda b, h, i: (0, 0)),
        ]
        args += list(extras[:4])
    if has_mask:
        in_specs += [pl.BlockSpec((1, 1, Lk), lambda b, h, i: (b, 0, 0))]
        args += [extras[-1]]

    kernel = functools.partial(
        _flash_bwd_kernel,
        scale=scale, causal=causal, has_rope=has_rope, has_mask=has_mask,
        block_q=block_q,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, H, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Lk, Dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lk, Dh), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lq, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, Dh), k.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, Dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lk, Dh), jnp.float32),
            pltpu.VMEM((Lk, Dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Lq * Lk * Dh,
            bytes_accessed=(q.size * 3 + k.size * 3) * q.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=interpret,
    )(*args)
    return dq, dk, dv


@functools.lru_cache(maxsize=64)
def _make_fa(has_rope: bool, has_mask: bool, causal: bool, scale: float,
             block_q: int, interpret: bool, bwd_impl: str = "pallas"):
    """Build a custom-vjp flash attention for one static configuration.

    All operands are explicit custom_vjp args (no closed-over tracers, which
    JAX's custom_vjp does not allow across transforms). sin/cos/mask get zero
    cotangents; the mask is passed as float32 so its zero cotangent is valid.
    """

    @jax.custom_vjp
    def fa(q, k, v, *extras):
        return _flash_call(
            q, k, v, extras,
            causal=causal, scale=scale, block_q=block_q,
            has_rope=has_rope, has_mask=has_mask, interpret=interpret,
        )

    def fwd(q, k, v, *extras):
        out = fa(q, k, v, *extras)
        return out, (q, k, v, out) + extras

    def bwd_pallas(res, g):
        q, k, v, out = res[:4]
        extras = res[4:]
        g = g.astype(q.dtype)
        delta = jnp.sum(
            g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
            keepdims=True,
        )
        dq, dk, dv = _flash_bwd_call(
            q, k, v, g, delta, extras,
            causal=causal, scale=scale, block_q=block_q,
            has_rope=has_rope, has_mask=has_mask, interpret=interpret,
        )
        zeros = tuple(jnp.zeros_like(e) for e in extras)
        return (dq, dk, dv) + zeros

    def bwd_xla(res, g):
        q, k, v, _ = res[:4]
        extras = res[4:]
        if has_rope:
            qsin, qcos = extras[0], extras[1]
        else:
            qsin = qcos = None
        mask = extras[-1] if has_mask else None

        def ref(a, b, c):
            m = (mask[:, 0, :] != 0.0) if mask is not None else None
            return multi_head_attention(
                a, b, c, sin=qsin, cos=qcos, kv_mask=m, causal=causal,
                scale=scale,
            )

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g.astype(q.dtype))
        zeros = tuple(jnp.zeros_like(e) for e in extras)
        return (dq.astype(q.dtype), dk.astype(k.dtype),
                dv.astype(v.dtype)) + zeros

    fa.defvjp(fwd, bwd_pallas if bwd_impl == "pallas" else bwd_xla)
    return fa


def _pad_axis(x: jax.Array, axis: int, to: int) -> jax.Array:
    pad = to - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _repack_halves(t: jax.Array, half: int, new_half: int, fill: float) -> jax.Array:
    """Pad the head dim while keeping rotate-half pairs (i, i+half) aligned."""
    a, b = t[..., :half], t[..., half:]
    pad = jnp.full(t.shape[:-1] + (new_half - half,), fill, t.dtype)
    return jnp.concatenate([a, pad, b, pad], axis=-1)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sin: Optional[jax.Array] = None,
    cos: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 256,
    backend: str = "auto",  # auto | pallas | xla | interpret
) -> jax.Array:
    """Flash attention with optional fused RoPE and key-padding mask.

    q/k/v: ``[B, H, L, Dh]``; sin/cos: ``[L, Dh]`` RoPE tables (self-attention
    only, Lq == Lk); kv_mask: bool/int ``[B, Lk]`` (nonzero = attend).

    ``backend='auto'`` uses the Pallas kernel on TPU and the XLA oracle
    elsewhere (CPU tests).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "xla":
        m = (kv_mask != 0) if kv_mask is not None else None
        return multi_head_attention(
            q, k, v, sin=sin, cos=cos, kv_mask=m, causal=causal, scale=scale
        )
    interpret = backend == "interpret"

    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    has_rope = sin is not None
    if has_rope and Lq != Lk:
        raise ValueError("RoPE flash attention requires self-attention (Lq == Lk)")
    scale_v = float(scale if scale is not None else Dh**-0.5)

    # ---- static padding to hardware tiles ----
    dh_pad = int(np.ceil(Dh / 128) * 128)
    bq = min(block_q, int(np.ceil(Lq / 128) * 128))
    lq_pad = int(np.ceil(Lq / bq) * bq)
    lk_pad = int(np.ceil(Lk / 128) * 128)
    if has_rope:
        lk_pad = max(lk_pad, lq_pad) if Lq == Lk else lk_pad
        lq_pad = lk_pad if Lq == Lk else lq_pad
        lq_pad = int(np.ceil(lq_pad / bq) * bq)
        lk_pad = lq_pad
    has_mask = kv_mask is not None or lk_pad != Lk
    if has_mask:
        base = kv_mask.astype(jnp.float32) if kv_mask is not None else jnp.ones((B, Lk), jnp.float32)
        maskf = _pad_axis(base, 1, lk_pad)[:, None, :]  # [B, 1, Lk]
    else:
        maskf = None

    if dh_pad != Dh and has_rope:
        half, ph = Dh // 2, dh_pad // 2
        qp = _repack_halves(q, half, ph, 0.0)
        kp = _repack_halves(k, half, ph, 0.0)
        vp = _pad_axis(v, 3, dh_pad)
        sin_p = _repack_halves(sin.astype(jnp.float32), half, ph, 0.0)
        cos_p = _repack_halves(cos.astype(jnp.float32), half, ph, 1.0)
    else:
        qp = _pad_axis(q, 3, dh_pad)
        kp = _pad_axis(k, 3, dh_pad)
        vp = _pad_axis(v, 3, dh_pad)
        sin_p = _pad_axis(sin.astype(jnp.float32), 1, dh_pad) if has_rope else None
        cos_p = (
            jnp.concatenate(
                [cos.astype(jnp.float32),
                 jnp.ones((Lq, dh_pad - Dh), jnp.float32)], axis=1
            )
            if has_rope and dh_pad != Dh
            else (cos.astype(jnp.float32) if has_rope else None)
        )

    qp = _pad_axis(qp, 2, lq_pad)
    kp = _pad_axis(kp, 2, lk_pad)
    vp = _pad_axis(vp, 2, lk_pad)

    extras = []
    if has_rope:
        qsin = _pad_axis(sin_p, 0, lq_pad)
        # identity rotation rows for padded positions (cos=1)
        pad_rows = lq_pad - sin_p.shape[0]
        if pad_rows > 0:
            qcos = jnp.concatenate(
                [cos_p, jnp.ones((pad_rows, dh_pad), jnp.float32)], axis=0
            )
        else:
            qcos = cos_p
        extras += [qsin, qcos, qsin, qcos]
    if has_mask:
        extras += [maskf]

    bwd_impl = os.environ.get("DEEPCORO_FLASH_BWD", "pallas")
    fa = _make_fa(has_rope, has_mask, causal, scale_v, bq, interpret, bwd_impl)
    out = fa(qp, kp, vp, *extras)
    return out[:, :, :Lq, :Dh]
