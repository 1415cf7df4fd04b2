import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.ops.attention import apply_rope
from deepcoro_clip_tpu.ops.rope3d import (
    apply_rope_np,
    build_rope3d_tables,
    rotate_half_np,
)


def test_table_shapes_and_special_rows():
    t = build_rope3d_tables(head_dim=48, T=2, H=3, W=4, n_special=1)
    assert t.sin.shape == (1 + 24, 48)
    assert t.cos.shape == (1 + 24, 48)
    # CLS row: identity rotation (reference: models/rope_3d.py:174-179)
    np.testing.assert_array_equal(t.sin[0], 0.0)
    np.testing.assert_array_equal(t.cos[0], 1.0)


def test_rotation_preserves_norm():
    """A rotary embedding is orthogonal: |rope(x)| == |x| per token."""
    t = build_rope3d_tables(head_dim=48, T=2, H=2, W=2)
    x = np.random.default_rng(0).normal(size=(5, 8, 48)).astype(np.float32)
    y = apply_rope_np(x, t)
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )


def test_relative_position_property_single_axis():
    """RoPE's defining property: <rope(q,i), rope(k,j)> depends only on i-j.
    Checked on the temporal axis with H=W=1."""
    t = build_rope3d_tables(head_dim=24, T=8, H=1, W=1)
    rng = np.random.default_rng(1)
    q = rng.normal(size=(24,)).astype(np.float64)
    k = rng.normal(size=(24,)).astype(np.float64)

    def rot(x, pos):
        return x * t.cos[pos] + rotate_half_np(x) * t.sin[pos]

    d1 = float(np.dot(rot(q, 3), rot(k, 1)))
    d2 = float(np.dot(rot(q, 6), rot(k, 4)))
    assert d1 == pytest.approx(d2, rel=1e-6)
    d3 = float(np.dot(rot(q, 5), rot(k, 1)))
    assert abs(d1 - d3) > 1e-8  # different offsets genuinely differ


def test_jax_matches_numpy_oracle():
    t = build_rope3d_tables(head_dim=24, T=2, H=2, W=3, n_special=1)
    x = np.random.default_rng(2).normal(size=(2, 4, 13, 24)).astype(np.float32)
    got = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(t.sin), jnp.asarray(t.cos)))
    want = apply_rope_np(x, t)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_temporal_scale_changes_only_t_axis():
    a = build_rope3d_tables(head_dim=24, T=4, H=2, W=2, temporal_scale=1.0)
    b = build_rope3d_tables(head_dim=24, T=4, H=2, W=2, temporal_scale=0.5)
    # the w-axis block (last third of the first half) is unchanged
    assert not np.allclose(a.sin, b.sin)
    np.testing.assert_allclose(a.sin[:, 8:12], b.sin[:, 8:12])
