"""Pallas flash attention vs the XLA oracle (interpret mode on CPU).

On the real TPU the same parity tests run compiled (see bench/verify scripts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.ops.attention import multi_head_attention
from deepcoro_clip_tpu.ops.flash_attention import flash_attention
from deepcoro_clip_tpu.ops.rope3d import build_rope3d_tables


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32) * 0.5
    )


@pytest.mark.parametrize("L", [128, 200])
def test_flash_matches_oracle_plain(L):
    q, k, v = (_rand((2, 2, L, 32), s) for s in range(3))
    ref = multi_head_attention(q, k, v)
    got = flash_attention(q, k, v, backend="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_matches_oracle_rope():
    T, H, W = 2, 4, 4
    L = 1 + T * H * W
    t = build_rope3d_tables(head_dim=32, T=T, H=H, W=W, n_special=1)
    q, k, v = (_rand((2, 2, L, 32), s) for s in range(3))
    sin, cos = jnp.asarray(t.sin), jnp.asarray(t.cos)
    ref = multi_head_attention(q, k, v, sin=sin, cos=cos)
    got = flash_attention(q, k, v, sin=sin, cos=cos, backend="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_matches_oracle_mask():
    B, L = 2, 160
    q, k, v = (_rand((B, 2, L, 32), s) for s in range(3))
    mask = jnp.asarray(np.random.default_rng(9).random((B, L)) > 0.3)
    ref = multi_head_attention(q, k, v, kv_mask=mask)
    got = flash_attention(q, k, v, kv_mask=mask, backend="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_causal():
    q, k, v = (_rand((1, 2, 64, 32), s) for s in range(3))
    ref = multi_head_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, backend="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_gradients_match_oracle():
    T, H, W = 2, 2, 4
    L = T * H * W
    t = build_rope3d_tables(head_dim=32, T=T, H=H, W=W)
    sin, cos = jnp.asarray(t.sin), jnp.asarray(t.cos)
    q, k, v = (_rand((1, 1, L, 32), s) for s in range(3))

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, sin=sin, cos=cos, backend="interpret") ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, sin=sin, cos=cos) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_cross_attention_no_rope():
    q = _rand((2, 2, 32, 32), 0)
    k = _rand((2, 2, 96, 32), 1)
    v = _rand((2, 2, 96, 32), 2)
    ref = multi_head_attention(q, k, v)
    got = flash_attention(q, k, v, backend="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("case", ["mask", "causal", "cross"])
def test_flash_pallas_backward_variants(case):
    """The Pallas backward kernel must match oracle grads for every static
    configuration (mask / causal / cross-attention)."""
    r = np.random.default_rng(1)
    if case == "cross":
        q = _rand((2, 2, 32, 32), 0)
        k = _rand((2, 2, 96, 32), 1)
        v = _rand((2, 2, 96, 32), 2)
        mask = None
        causal = False
    else:
        q = _rand((2, 2, 96, 32), 0)
        k, v = _rand((2, 2, 96, 32), 1), _rand((2, 2, 96, 32), 2)
        mask = (jnp.asarray(r.random((2, 96)) > 0.3) if case == "mask" else None)
        causal = case == "causal"

    def lf(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, kv_mask=mask, causal=causal, backend="interpret") ** 2)

    def lr(q, k, v):
        return jnp.sum(multi_head_attention(
            q, k, v, kv_mask=mask, causal=causal) ** 2)

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_exp2_softmax_path_matches_oracle(monkeypatch):
    """DEEPCORO_EXP2_SOFTMAX=1 folds log2e into the score scale and uses
    native exp2 — mathematically the same softmax (flash_attention.py::
    softmax_base); values and grads must agree with the oracle, with RoPE
    and a key-padding mask engaged."""
    monkeypatch.setenv("DEEPCORO_EXP2_SOFTMAX", "1")
    T, H, W = 2, 2, 4
    L = T * H * W
    t = build_rope3d_tables(head_dim=32, T=T, H=H, W=W)
    sin, cos = jnp.asarray(t.sin), jnp.asarray(t.cos)
    q, k, v = (_rand((2, 2, L, 32), s) for s in range(3))
    mask = jnp.asarray(np.array([[1] * L, [1] * (L - 5) + [0] * 5]))

    ref = multi_head_attention(q, k, v, sin=sin, cos=cos, kv_mask=mask)
    got = flash_attention(q, k, v, sin=sin, cos=cos, kv_mask=mask,
                          backend="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, sin=sin, cos=cos,
                                       kv_mask=mask, backend="interpret") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, sin=sin, cos=cos,
                                            kv_mask=mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
