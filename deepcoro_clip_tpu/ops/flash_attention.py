"""Pallas TPU flash attention with fused 3D RoPE (forward + backward kernels).

Replaces the reference's cuDNN/SDPA attention inside MViT blocks (reference:
models/video_encoder.py:259-388, where 3D RoPE is monkey-patched into
torchvision's MultiScaleAttention). The RoPE rotation is fused into the
kernels: q/k tiles are rotated in VMEM right before the MXU dot.

Kernel shape
------------
Operands are laid out ``[G, Hf, L, Dh]`` with ``G x Hf = B x H``: all ``Hf``
heads of one group run in ONE grid program (batched MXU dots over the head
axis). Folding the heads cuts grid-step count by H — per-step overhead, not
FLOPs, dominates at clinical sequence lengths (L <= ~2k), measured ~30us per
grid step on v5e. The wrapper picks Hf = H when the VMEM budget allows, else
falls back to per-head (Hf = 1).

grid = (G, num_q_blocks); the FULL K/V for a group stays resident in VMEM
across q-block steps (Pallas skips the DMA when the block index map output is
unchanged), so K/V are read from HBM exactly once per group. Each q block
does ONE exact softmax (fp32 statistics) — no online rescaling, which keeps
eval numerics batch-size invariant (the reference's reproducibility
criterion, scripts/run_reproducibility_tests.py:1-8). The L x L score matrix
never exists in HBM.

Backward: Dao-style flash backward kernel; dK/dV accumulate in fp32 VMEM
scratch across q-block steps and flush on the last one.
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
# exp(x) lowers to exp2(x*log2e) on the VPU — folding log2e into the score
# scale (exact: the softmax is the same function of s) turns the
# [*, bq, Lk] sub+mul+exp2 into sub+exp2, one fewer full-score-matrix VPU
# pass in both kernels. The softmax statistics (max/sum) are computed on
# the log2-scaled scores, which is self-consistent.
LOG2E = 1.4426950408889634


def softmax_base():
    """(exp_fn, scale_fold) read at trace time: DEEPCORO_EXP2_SOFTMAX=1
    selects the exp2 path with log2e folded into the score scale.
    Env-gated (like DEEPCORO_PACKED_ATTN) so long chunked runs keep one
    program across process restarts until the flip is deliberate."""
    if os.environ.get("DEEPCORO_EXP2_SOFTMAX", "0") == "1":
        return jnp.exp2, LOG2E
    return jnp.exp, 1.0
VMEM_BUDGET = 10 * 1024 * 1024  # conservative per-kernel working-set budget


def _rot(x, sin, cos):
    """Global rotate-half RoPE on the last axis (tables broadcast over
    leading dims)."""
    half = x.shape[-1] // 2
    xr = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + xr * sin


def _unrot(g, sin, cos):
    """Transpose of _rot: dx = g*cos - rotate_half(g*sin)."""
    z = g * sin
    half = g.shape[-1] // 2
    zr = jnp.concatenate([-z[..., half:], z[..., :half]], axis=-1)
    return g * cos - zr


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #


def _fwd_kernel(*refs, scale, causal, has_rope, has_mask, block_q):
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

    q = q_ref[0]  # [Hf, bq, Dh]
    k = k_ref[0]  # [Hf, Lk, Dh]

    if has_rope:
        q = _rot(q, qsin_ref[...].astype(q.dtype), qcos_ref[...].astype(q.dtype))
        k = _rot(k, ksin_ref[...].astype(k.dtype), kcos_ref[...].astype(k.dtype))

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (scale * _fold)  # [Hf, bq, Lk] (softmax_base: exp2 log2-fold)

    if has_mask:
        valid = mask_ref[0] != 0.0  # [1, Lk]
        s = jnp.where(valid, s, NEG_INF)
    if causal:
        iq = pl.program_id(1)
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(row >= col, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = _exp(s - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

    v = v_ref[0]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _fwd_call(q, k, v, extras, *, causal, scale, block_q, has_rope, has_mask,
              interpret):
    G, Hf, Lq, Dh = q.shape
    Lk = k.shape[2]
    nq = Lq // block_q

    in_specs = [
        pl.BlockSpec((1, Hf, block_q, Dh), lambda g, i: (g, 0, i, 0)),
        pl.BlockSpec((1, Hf, Lk, Dh), lambda g, i: (g, 0, 0, 0)),
        pl.BlockSpec((1, Hf, Lk, Dh), lambda g, i: (g, 0, 0, 0)),
    ]
    if has_rope:
        in_specs += [
            pl.BlockSpec((block_q, Dh), lambda g, i: (i, 0)),
            pl.BlockSpec((block_q, Dh), lambda g, i: (i, 0)),
            pl.BlockSpec((Lk, Dh), lambda g, i: (0, 0)),
            pl.BlockSpec((Lk, Dh), lambda g, i: (0, 0)),
        ]
    if has_mask:
        in_specs += [pl.BlockSpec((1, 1, Lk), lambda g, i: (g, 0, 0))]

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, has_rope=has_rope,
        has_mask=has_mask, block_q=block_q,
    )
    return pl.pallas_call(
        kernel,
        grid=(G, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hf, block_q, Dh), lambda g, i: (g, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, Hf, Lq, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * Hf * Lq * Lk * Dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=G * Hf * Lq * Lk,
        ),
        interpret=interpret,
    )(q, k, v, *extras)


# --------------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------------- #


def _bwd_kernel(*refs, scale, causal, has_rope, has_mask, block_q):
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

    q = q_ref[0]    # [Hf, bq, Dh]
    k = k_ref[0]    # [Hf, Lk, Dh]
    v = v_ref[0]
    do = do_ref[0]  # [Hf, bq, Dh]

    if has_rope:
        q = _rot(q, qsin_ref[...].astype(q.dtype), qcos_ref[...].astype(q.dtype))
        k = _rot(k, ksin_ref[...].astype(k.dtype), kcos_ref[...].astype(k.dtype))

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (scale * _fold)  # [Hf, bq, Lk] (softmax_base: exp2 log2-fold)
    if has_mask:
        valid = mask_ref[0] != 0.0
        s = jnp.where(valid, s, NEG_INF)
    if causal:
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(row >= col, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = _exp(s - m)
    l = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / l  # matches fwd semantics exactly

    pb = p.astype(v.dtype)
    dv_acc[...] += jax.lax.dot_general(
        pb, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hf, Lk, Dh]
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hf, bq, Lk]
    # delta = rowsum(do * out) computed IN-kernel from the out residual:
    # a host-side [G, Hf, Lq, 1] fp32 delta operand has a 1-lane minor dim
    # whose layout materialization profiled at 3.4 GiB/s VMEM writes
    # (~1.5 ms/step across the video tower). do is already resident; out
    # streams in at full-lane width instead.
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # [Hf, bq, 1] fp32
    ds = (p * (dp - delta) * scale).astype(q.dtype)

    dq_rot = jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hf, bq, Dh] fp32
    if has_rope:
        dq = _unrot(dq_rot, qsin_ref[...], qcos_ref[...])
    else:
        dq = dq_rot
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_acc[...] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hf, Lk, Dh]

    @pl.when(iq == nq - 1)
    def _():
        dkr = dk_acc[...]
        if has_rope:
            dkk = _unrot(dkr, ksin_ref[...], kcos_ref[...])
        else:
            dkk = dkr
        dk_ref[0] = dkk.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_call(q, k, v, do, out, extras, *, causal, scale, block_q,
              has_rope, has_mask, interpret):
    G, Hf, Lq, Dh = q.shape
    Lk = k.shape[2]
    nq = Lq // block_q

    in_specs = [
        pl.BlockSpec((1, Hf, block_q, Dh), lambda g, i: (g, 0, i, 0)),  # q
        pl.BlockSpec((1, Hf, Lk, Dh), lambda g, i: (g, 0, 0, 0)),       # k
        pl.BlockSpec((1, Hf, Lk, Dh), lambda g, i: (g, 0, 0, 0)),       # v
        pl.BlockSpec((1, Hf, block_q, Dh), lambda g, i: (g, 0, i, 0)),  # do
        pl.BlockSpec((1, Hf, block_q, Dh), lambda g, i: (g, 0, i, 0)),  # out
    ]
    args = [q, k, v, do, out]
    if has_rope:
        in_specs += [
            pl.BlockSpec((block_q, Dh), lambda g, i: (i, 0)),
            pl.BlockSpec((block_q, Dh), lambda g, i: (i, 0)),
            pl.BlockSpec((Lk, Dh), lambda g, i: (0, 0)),
            pl.BlockSpec((Lk, Dh), lambda g, i: (0, 0)),
        ]
        args += list(extras[:4])
    if has_mask:
        in_specs += [pl.BlockSpec((1, 1, Lk), lambda g, i: (g, 0, 0))]
        args += [extras[-1]]

    kernel = functools.partial(
        _bwd_kernel, scale=scale, causal=causal, has_rope=has_rope,
        has_mask=has_mask, block_q=block_q,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(G, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Hf, block_q, Dh), lambda g, i: (g, 0, i, 0)),
            pl.BlockSpec((1, Hf, Lk, Dh), lambda g, i: (g, 0, 0, 0)),
            pl.BlockSpec((1, Hf, Lk, Dh), lambda g, i: (g, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Hf, Lq, Dh), q.dtype),
            jax.ShapeDtypeStruct((G, Hf, Lk, Dh), k.dtype),
            jax.ShapeDtypeStruct((G, Hf, Lk, Dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hf, Lk, Dh), jnp.float32),
            pltpu.VMEM((Hf, Lk, Dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * G * Hf * Lq * Lk * Dh,
            bytes_accessed=(q.size * 4 + k.size * 3) * q.dtype.itemsize,
            transcendentals=G * Hf * Lq * Lk,
        ),
        interpret=interpret,
    )(*args)
    return dq, dk, dv


# --------------------------------------------------------------------------- #
# custom-vjp assembly
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=64)
def _make_fa(has_rope: bool, has_mask: bool, causal: bool, scale: float,
             block_q: int, interpret: bool, bwd_impl: str):
    """custom-vjp flash attention for one static configuration. All operands
    are explicit args (custom_vjp forbids closed-over tracers); sin/cos/mask
    get zero cotangents (mask travels as float32 so its zero cotangent is
    valid)."""

    @jax.custom_vjp
    def fa(q, k, v, *extras):
        return _fwd_call(
            q, k, v, extras, causal=causal, scale=scale, block_q=block_q,
            has_rope=has_rope, has_mask=has_mask, interpret=interpret,
        )

    def fwd(q, k, v, *extras):
        out = fa(q, k, v, *extras)
        return out, (q, k, v, out) + extras

    def bwd_pallas(res, g):
        q, k, v, out = res[:4]
        extras = res[4:]
        g = g.astype(q.dtype)
        dq, dk, dv = _bwd_call(
            q, k, v, g, out, extras, causal=causal, scale=scale,
            block_q=block_q, has_rope=has_rope, has_mask=has_mask,
            interpret=interpret,
        )
        zeros = tuple(jnp.zeros_like(e) for e in extras)
        return (dq, dk, dv) + zeros

    def bwd_xla(res, g):
        q, k, v, _ = res[:4]
        extras = res[4:]
        qsin, qcos = (extras[0], extras[1]) if has_rope else (None, None)
        mask = extras[-1] if has_mask else None

        def ref(a, b, c):
            G, Hf = a.shape[:2]
            m = None
            if mask is not None:
                m = (mask[:, 0, :] != 0.0)
                m = jnp.repeat(m[:, None], Hf, 1).reshape(G * Hf, -1)
            out = multi_head_attention(
                a.reshape(G * Hf, 1, *a.shape[2:]),
                b.reshape(G * Hf, 1, *b.shape[2:]),
                c.reshape(G * Hf, 1, *c.shape[2:]),
                sin=qsin, cos=qcos,
                kv_mask=m,
                causal=causal, scale=scale,
            )
            return out.reshape(a.shape)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g.astype(q.dtype))
        zeros = tuple(jnp.zeros_like(e) for e in extras)
        return (dq.astype(q.dtype), dk.astype(k.dtype),
                dv.astype(v.dtype)) + zeros

    fa.defvjp(fwd, bwd_pallas if bwd_impl == "pallas" else bwd_xla)
    return fa


# --------------------------------------------------------------------------- #
# public wrapper
# --------------------------------------------------------------------------- #


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


def _choose_layout(B, H, lq_pad, lk_pad, dh_pad, block_q, itemsize=2):
    """Pick (fold_heads, block_q) under the VMEM working-set budget.

    Grid-step count = (B*H*Lq) / (Hf*bq); per-step overhead dominates at
    clinical L, so maximize Hf*bq (more work per step), penalizing q-length
    padding waste."""
    best = None
    divisors = [d for d in range(1, H + 1) if H % d == 0]
    for Hf in divisors:
        for bq in (512, 256, 128, 64):
            if bq > block_q or bq > lq_pad:
                continue
            padded_lq = int(np.ceil(lq_pad / bq) * bq)
            waste = padded_lq / lq_pad
            if waste > 1.25:
                continue
            scratch = 2 * Hf * lk_pad * dh_pad * 4        # fp32 dk/dv acc
            kv = 2 * Hf * lk_pad * dh_pad * itemsize * 2  # double-buffered
            tiles = 3 * Hf * bq * lk_pad * 4              # s/dp/ds fp32
            qo = 6 * Hf * bq * dh_pad * 4
            if scratch + kv + tiles + qo > VMEM_BUDGET:
                continue
            score = Hf * bq / waste
            key = (score, bq)
            if best is None or key > best[0]:
                best = (key, (Hf, bq))
    if best is None:
        return 1, min(128, lq_pad)
    return best[1]


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sin: Optional[jax.Array] = None,
    cos: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 512,
    backend: str = "auto",  # auto | pallas | xla | interpret
) -> jax.Array:
    """Flash attention with optional fused RoPE and key-padding mask.

    q/k/v: ``[B, H, L, Dh]``; sin/cos: ``[L, Dh]`` RoPE tables (self-attention
    only, Lq == Lk); kv_mask: bool/int ``[B, Lk]`` (nonzero = attend).

    ``backend='auto'`` uses the Pallas kernels on TPU and the XLA oracle
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
    lk_pad = int(np.ceil(Lk / 128) * 128)
    lq_pad = int(np.ceil(Lq / 128) * 128)
    if has_rope:  # self-attention: keep q/k padding identical
        lq_pad = lk_pad = max(lq_pad, lk_pad)
    fold, bq = _choose_layout(
        B, H, lq_pad, lk_pad, dh_pad, block_q, itemsize=q.dtype.itemsize
    )
    lq_pad = int(np.ceil(lq_pad / bq) * bq)
    if has_rope:
        lk_pad = lq_pad

    has_mask = kv_mask is not None or lk_pad != Lk
    if has_mask:
        base = (kv_mask.astype(jnp.float32) if kv_mask is not None
                else jnp.ones((B, Lk), jnp.float32))
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
        if has_rope:
            sin_p = _pad_axis(sin.astype(jnp.float32), 1, dh_pad)
            cos_p = (
                jnp.concatenate(
                    [cos.astype(jnp.float32),
                     jnp.ones((Lq, dh_pad - Dh), jnp.float32)], axis=1
                ) if dh_pad != Dh else cos.astype(jnp.float32)
            )
        else:
            sin_p = cos_p = None

    qp = _pad_axis(qp, 2, lq_pad)
    kp = _pad_axis(kp, 2, lk_pad)
    vp = _pad_axis(vp, 2, lk_pad)

    extras = []
    if has_rope:
        qsin = _pad_axis(sin_p, 0, lq_pad)
        pad_rows = lq_pad - sin_p.shape[0]
        qcos = (jnp.concatenate(
            [cos_p, jnp.ones((pad_rows, dh_pad), jnp.float32)], axis=0)
            if pad_rows > 0 else cos_p)
        extras += [qsin, qcos, qsin, qcos]

    # ---- head folding layout ----
    if fold == H:
        pass  # [B, H, L, D] as-is; G = B
    else:
        qp = qp.reshape(B * H, 1, lq_pad, dh_pad)
        kp = kp.reshape(B * H, 1, lk_pad, dh_pad)
        vp = vp.reshape(B * H, 1, lk_pad, dh_pad)
        if maskf is not None:
            maskf = jnp.repeat(maskf, H, axis=0)
    if has_mask:
        extras += [maskf]

    bwd_impl = os.environ.get("DEEPCORO_FLASH_BWD", "pallas")
    fa = _make_fa(has_rope, has_mask, causal, scale_v, bq, interpret, bwd_impl)
    out = fa(qp, kp, vp, *extras)
    out = out.reshape(B, H, lq_pad, dh_pad)
    return out[:, :, :Lq, :Dh]
