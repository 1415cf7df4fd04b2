"""Ring attention: sequence/context parallelism over the mesh.

NEW capability relative to the reference, which has no sequence parallelism
of any kind (SURVEY.md §5.7 — "ring attention ... optional new capability").
The token axis is sharded across mesh devices; K/V chunks rotate around the
ring via ``jax.lax.ppermute`` (ICI neighbor exchange) while each device
accumulates its queries' attention with the standard online-softmax update.
Peak memory per device is O(L_local^2 * n) -> O(L^2 / n), enabling token
counts far beyond single-chip HBM (e.g. joint attention over every clip of a
study, or unpooled 25k-token MViT stages).

Two interchangeable transports:
- ``backend="xla"``: shard_map + ``jax.lax.ppermute`` — XLA inserts the
  neighbor exchanges between scan steps (portable; compiler-scheduled).
- ``backend="rdma"``: a Pallas kernel owning the ring — double-buffered K/V
  slots rotate via ``pltpu.make_async_remote_copy`` (chip-to-chip RDMA over
  ICI) started BEFORE each block's attention math, so the next chunk streams
  in while the MXU works on the current one; per-iteration neighbor barriers
  provide slot backpressure (pallas_guide.md "Ring Collectives"). Backward
  reuses the XLA ring's autodiff (custom_vjp), keeping the hand-written
  surface forward-only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def _ring_body(q, k, v, scale: float, axis_name: str):
    """Per-shard computation: q is this device's query chunk; k/v rotate."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def accumulate(carry, k_cur, v_cur):
        m, l, acc = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32
        ) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    # derive the carries from q so they inherit q's varying manual axes
    # (fresh constants would be unvarying and break the scan carry types);
    # the local chunk is accumulated before the loop, so only n-1 ring
    # exchanges happen (no discarded final permute)
    m = jnp.full_like(q[..., :1], -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros_like(q[..., :1], dtype=jnp.float32)
    acc = jnp.zeros_like(q, dtype=jnp.float32)
    m, l, acc = accumulate((m, l, acc), k, v)

    def step(carry, _):
        m, l, acc, k_cur, v_cur = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        m, l, acc = accumulate((m, l, acc), k_cur, v_cur)
        return (m, l, acc, k_cur, v_cur), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m, l, acc, k, v), None, length=n - 1
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


# --------------------------------------------------------------------------- #
# Pallas RDMA transport
# --------------------------------------------------------------------------- #


def _rdma_ring_kernel(q_ref, k_ref, v_ref, o_ref, kv_ref, send_sem, recv_sem,
                      *, n, scale, axis_name):
    """One device's whole ring pass. Shapes (all VMEM-resident):
    q/k/v [BH, Lc, Dh]; kv scratch [2 slots, 2 (k|v), BH, Lc, Dh].

    Protocol per iteration r (unrolled; n is static):
      1. start RDMA of slot cur -> right neighbor's slot nxt  (r < n-1)
      2. online-softmax accumulate with slot cur               (overlaps 1)
      3. barrier with both neighbors — they finished step r, so their slots
         are safe to overwrite next iteration (slot backpressure)
      4. wait own send done + own incoming arrival             (r < n-1)
    Semaphore accounting is exact (every signal matched by a wait), so all
    semaphores drain to zero at kernel exit."""
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my + n - 1, n)

    def device_id(idx):
        # MESH addressing: only the ring axis varies, other axes implicit
        return {axis_name: idx}

    def neighbor_barrier():
        bar = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            bar, inc=1, device_id=device_id(left),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        pltpu.semaphore_signal(
            bar, inc=1, device_id=device_id(right),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        pltpu.semaphore_wait(bar, 2)

    kv_ref[0, 0] = k_ref[...]
    kv_ref[0, 1] = v_ref[...]

    q = q_ref[...]
    m = jnp.full(q.shape[:-1] + (1,), -jnp.inf, jnp.float32)
    l = jnp.zeros(q.shape[:-1] + (1,), jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)

    if n > 1:
        neighbor_barrier()  # every device has buffered slot 0

    for r in range(n):
        cur, nxt = r % 2, (r + 1) % 2
        rdma = None
        if r < n - 1:
            rdma = pltpu.make_async_remote_copy(
                src_ref=kv_ref.at[cur],
                dst_ref=kv_ref.at[nxt],
                send_sem=send_sem.at[cur],
                recv_sem=recv_sem.at[nxt],
                device_id=device_id(right),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma.start()

        k_cur = kv_ref[cur, 0]
        v_cur = kv_ref[cur, 1]
        s = jax.lax.dot_general(
            q, k_cur, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [BH, Lq, Lk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_cur.dtype), v_cur,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m = m_new

        if r < n - 1:
            neighbor_barrier()  # neighbors done with step r -> slots free
            rdma.wait()

    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _rdma_shard_body(q, k, v, *, scale, axis_name, n, interpret,
                     collective_id):
    """Inside shard_map: q/k/v are the local [B, H, Lc, Dh] shards."""
    B, H, Lc, Dh = q.shape
    q3 = q.reshape(B * H, Lc, Dh)
    k3 = k.reshape(B * H, Lc, Dh)
    v3 = v.reshape(B * H, Lc, Dh)
    kernel = functools.partial(
        _rdma_ring_kernel, n=n, scale=scale, axis_name=axis_name,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, B * H, Lc, Dh), k3.dtype),  # kv ring slots
            pltpu.SemaphoreType.DMA((2,)),                # send per slot
            pltpu.SemaphoreType.DMA((2,)),                # recv per slot
        ],
        compiler_params=pltpu.CompilerParams(
            # barrier semaphores (used only when the ring has >1 device)
            # require a collective_id; Mosaic rejects one otherwise
            collective_id=collective_id if n > 1 else None,
            has_side_effects=True,
        ),
        interpret=(
            pltpu.InterpretParams() if interpret else False
        ),
    )(q3, k3, v3)
    return out.reshape(B, H, Lc, Dh)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    scale: Optional[float] = None,
    backend: str = "xla",  # xla | rdma | rdma_interpret
    collective_id: int = 7,
) -> jax.Array:
    """Exact attention with the token axis sharded over ``mesh[axis]``.

    q/k/v: ``[B, H, L, Dh]`` with L divisible by the axis size. Returns
    ``[B, H, L, Dh]`` sharded the same way. Numerically equivalent to
    ops/attention.py's oracle (online softmax is exact).

    ``backend="rdma"`` runs the forward pass as a Pallas kernel whose K/V
    ring exchange rides chip-to-chip RDMA overlapped with the attention
    math; gradients flow through the XLA ring (custom_vjp).
    ``backend="rdma_interpret"`` is the same kernel under the Pallas TPU
    interpreter (CPU multi-device testing)."""
    Dh = q.shape[-1]
    scale_v = float(scale if scale is not None else Dh**-0.5)
    spec = P(None, None, axis, None)

    xla_fn = _shard_map(
        functools.partial(_ring_body, scale=scale_v, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    if backend == "xla":
        return xla_fn(q, k, v)
    if backend not in ("rdma", "rdma_interpret"):
        raise ValueError(f"unknown ring attention backend {backend!r}")

    n = mesh.shape[axis]
    rdma_fn = _shard_map(
        functools.partial(
            _rdma_shard_body, scale=scale_v, axis_name=axis, n=n,
            interpret=(backend == "rdma_interpret"),
            collective_id=collective_id,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )

    @jax.custom_vjp
    def fa(q, k, v):
        return rdma_fn(q, k, v)

    def fwd(q, k, v):
        return fa(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        _, vjp = jax.vjp(xla_fn, q, k, v)
        return vjp(g)

    fa.defvjp(fwd, bwd)
    return fa(q, k, v)
