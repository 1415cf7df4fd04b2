"""Packed-layout flash attention vs the XLA oracle (interpret mode).

Same math as ops/flash_attention.py; the layout contract under test is
[B, L, H*Dh] operands with heads as 128-lane tiles (incl. the fused-QKV
aliased-operand path and the Dao backward)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.ops import build_rope3d_tables
from deepcoro_clip_tpu.ops.attention import multi_head_attention
from deepcoro_clip_tpu.ops import flash_attention_packed as fap

B, H, DH = 2, 2, 128
D = H * DH


def _mk(L, Lk=None, dtype=jnp.float32, seed=0):
    r = np.random.default_rng(seed)
    Lk = Lk or L
    q = jnp.asarray(r.normal(size=(B, L, D)), dtype) * 0.3
    k = jnp.asarray(r.normal(size=(B, Lk, D)), dtype) * 0.3
    v = jnp.asarray(r.normal(size=(B, Lk, D)), dtype) * 0.3
    return q, k, v


def _oracle(q, k, v, sin=None, cos=None, kv_mask=None, causal=False):
    Lq, Lk = q.shape[1], k.shape[1]
    qh = q.reshape(B, Lq, H, DH).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Lk, H, DH).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lk, H, DH).transpose(0, 2, 1, 3)
    out = multi_head_attention(qh, kh, vh, sin=sin, cos=cos,
                               kv_mask=kv_mask, causal=causal)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D)


def test_plain_self_attention_with_padding():
    q, k, v = _mk(200)  # 200 -> padded to 256
    out = fap.flash_attention_packed(q, k, v, num_heads=H,
                                     backend="interpret")
    ref = _oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_qkv_matches_separate():
    q, k, v = _mk(128)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    out_f = fap.flash_attention_packed(qkv=qkv, num_heads=H,
                                       backend="interpret")
    out_s = fap.flash_attention_packed(q, k, v, num_heads=H,
                                       backend="interpret")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(_oracle(q, k, v)),
                               atol=2e-5, rtol=2e-5)


def test_rope_fused():
    T, Hh, W = 4, 7, 7
    L = 1 + T * Hh * W  # 197 with a special (CLS) row
    t = build_rope3d_tables(DH, T, Hh, W, n_special=1)
    sin, cos = jnp.asarray(t.sin), jnp.asarray(t.cos)
    q, k, v = _mk(L)
    out = fap.flash_attention_packed(q, k, v, num_heads=H, sin=sin, cos=cos,
                                     backend="interpret")
    ref = _oracle(q, k, v, sin=sin, cos=cos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_kv_mask():
    q, k, v = _mk(64, Lk=160)
    r = np.random.default_rng(3)
    mask = jnp.asarray(r.integers(0, 2, (B, 160)).astype(np.int32))
    mask = mask.at[:, 0].set(1)  # at least one valid key
    out = fap.flash_attention_packed(q, k, v, num_heads=H, kv_mask=mask,
                                     backend="interpret")
    ref = _oracle(q, k, v, kv_mask=(mask != 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_causal():
    q, k, v = _mk(128)
    out = fap.flash_attention_packed(q, k, v, num_heads=H, causal=True,
                                     backend="interpret")
    ref = _oracle(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cross_attention():
    q, k, v = _mk(64, Lk=392)
    out = fap.flash_attention_packed(q, k, v, num_heads=H,
                                     backend="interpret")
    ref = _oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode", ["plain", "rope", "mask"])
def test_grads_match_oracle(mode):
    L = 136  # pads to 256 -> exercises padded-row gradients
    q, k, v = _mk(L)
    kw_p, kw_o = {}, {}
    if mode == "rope":
        t = build_rope3d_tables(DH, 2, 8, 8, n_special=L - 128)
        sin, cos = jnp.asarray(t.sin), jnp.asarray(t.cos)
        kw_p = dict(sin=sin, cos=cos)
        kw_o = dict(sin=sin, cos=cos)
    if mode == "mask":
        mask = jnp.asarray((np.arange(L) < L - 9)[None].repeat(B, 0)
                           .astype(np.int32))
        kw_p = dict(kv_mask=mask)
        kw_o = dict(kv_mask=(mask != 0))

    w = jnp.asarray(np.random.default_rng(5).normal(size=(B, L, D)),
                    jnp.float32)

    def f_packed(q, k, v):
        out = fap.flash_attention_packed(q, k, v, num_heads=H,
                                         backend="interpret", **kw_p)
        return jnp.sum(out * w)

    def f_oracle(q, k, v):
        return jnp.sum(_oracle(q, k, v, **kw_o) * w)

    gp = jax.grad(f_packed, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name} mismatch ({mode})")


def test_fused_qkv_grads():
    q, k, v = _mk(128)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    w = jnp.asarray(np.random.default_rng(6).normal(size=(B, 128, D)),
                    jnp.float32)

    def f_fused(qkv):
        out = fap.flash_attention_packed(qkv=qkv, num_heads=H,
                                         backend="interpret")
        return jnp.sum(out * w)

    def f_ref(qkv):
        a, b, c = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
        return jnp.sum(_oracle(a, b, c) * w)

    g = jax.grad(f_fused)(qkv)
    gr = jax.grad(f_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=5e-5, rtol=5e-5)


def test_head_subblock_path(monkeypatch):
    """Force Hb < H so the grid iterates head-blocks."""
    monkeypatch.setattr(fap, "_choose_packed",
                        lambda *a, **k: (1, 128))  # Hb=1, bq=128
    q, k, v = _mk(128, seed=9)
    out = fap.flash_attention_packed(q, k, v, num_heads=H,
                                     backend="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(q, k, v)),
                               atol=2e-5, rtol=2e-5)


def test_matches_standard_flash_kernel():
    """Same inputs through both kernels (interpret): identical math."""
    from deepcoro_clip_tpu.ops.flash_attention import flash_attention

    q, k, v = _mk(256, seed=11)
    out_p = fap.flash_attention_packed(q, k, v, num_heads=H,
                                       backend="interpret")
    qh = q.reshape(B, 256, H, DH).transpose(0, 2, 1, 3)
    kh = k.reshape(B, 256, H, DH).transpose(0, 2, 1, 3)
    vh = v.reshape(B, 256, H, DH).transpose(0, 2, 1, 3)
    out_s = flash_attention(qh, kh, vh, backend="interpret")
    out_s = out_s.transpose(0, 2, 1, 3).reshape(B, 256, D)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               atol=1e-6, rtol=1e-6)


def test_xla_fallback_and_bf16():
    q, k, v = _mk(96, dtype=jnp.bfloat16, seed=2)
    out = fap.flash_attention_packed(q, k, v, num_heads=H, backend="xla")
    assert out.shape == (B, 96, D) and out.dtype == jnp.bfloat16
    out_i = fap.flash_attention_packed(q, k, v, num_heads=H,
                                       backend="interpret")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_i, np.float32),
        atol=3e-2, rtol=3e-2)


def test_rejects_unaligned_head_dim():
    q = jnp.zeros((B, 64, 2 * 64))  # Dh = 64
    with pytest.raises(ValueError, match="128"):
        fap.flash_attention_packed(q, q, q, num_heads=2, backend="interpret")


def test_attention_module_packed_wiring(monkeypatch):
    """models.layers.Attention takes the packed path when Dh%128==0 and the
    env gate is on; outputs match the standard path (CPU: both fall back to
    the oracle, so this pins the wiring/shapes, not the kernel)."""
    import flax.linen as nn  # noqa: F401  (module import side effects)
    from deepcoro_clip_tpu.models.layers import Attention

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 256)),
                    jnp.float32)
    attn = Attention(dim=256, num_heads=2, dtype=jnp.float32, use_flash=True)
    params = attn.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    monkeypatch.setenv("DEEPCORO_PACKED_ATTN", "0")
    out_std = attn.apply({"params": params}, x)
    monkeypatch.setenv("DEEPCORO_PACKED_ATTN", "1")
    out_packed = attn.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_std),
                               atol=1e-5, rtol=1e-5)

    # cross-attention branch too
    ctx = jnp.asarray(np.random.default_rng(1).normal(size=(2, 24, 256)),
                      jnp.float32)
    ca = Attention(dim=256, num_heads=2, dtype=jnp.float32, use_flash=True)
    p2 = ca.init({"params": jax.random.PRNGKey(1)}, x, context=ctx)["params"]
    monkeypatch.setenv("DEEPCORO_PACKED_ATTN", "0")
    o1 = ca.apply({"params": p2}, x, context=ctx)
    monkeypatch.setenv("DEEPCORO_PACKED_ATTN", "1")
    o2 = ca.apply({"params": p2}, x, context=ctx)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               atol=1e-5, rtol=1e-5)


def test_exp2_softmax_path(monkeypatch):
    """The gated exp2 log2-fold (flash_attention.softmax_base) must leave
    the packed kernel oracle-exact too, fwd and grads."""
    monkeypatch.setenv("DEEPCORO_EXP2_SOFTMAX", "1")
    q, k, v = _mk(128)
    out = fap.flash_attention_packed(q, k, v, num_heads=H,
                                     backend="interpret")
    ref = _oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(f(q, k, v) ** 2)
        return jax.grad(inner, argnums=(0, 1, 2))(q, k, v)

    gf = loss(lambda a, b, c: fap.flash_attention_packed(
        a, b, c, num_heads=H, backend="interpret"))
    gr = loss(_oracle)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
