"""Ring attention: sequence/context parallelism over the mesh.

NEW capability relative to the reference, which has no sequence parallelism
of any kind (SURVEY.md §5.7 — "ring attention ... optional new capability").
The token axis is sharded across mesh devices; K/V chunks rotate around the
ring via ``jax.lax.ppermute`` (ICI neighbor exchange) while each device
accumulates its queries' attention with the standard online-softmax update.
Peak memory per device is O(L_local^2 * n) -> O(L^2 / n), enabling token
counts far beyond single-chip HBM (e.g. joint attention over every clip of a
study, or unpooled 25k-token MViT stages).

Pure XLA collectives (shard_map + ppermute): portable to any mesh axis and
composable with the data-parallel axis. A Pallas RDMA variant
(make_async_remote_copy, pallas_guide.md "Ring Collectives") is the planned
next optimisation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
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


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention with the token axis sharded over ``mesh[axis]``.

    q/k/v: ``[B, H, L, Dh]`` with L divisible by the axis size. Returns
    ``[B, H, L, Dh]`` sharded the same way. Numerically equivalent to
    ops/attention.py's oracle (online softmax is exact).
    """
    Dh = q.shape[-1]
    scale_v = float(scale if scale is not None else Dh**-0.5)
    spec = P(None, None, axis, None)

    fn = _shard_map(
        functools.partial(_ring_body, scale=scale_v, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
