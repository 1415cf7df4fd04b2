"""Fused output-projection epilogue (DEEPCORO_FUSED_OUTPROJ).

The packed flash kernel's ``wo=`` path applies the attention output
projection inside the kernel epilogue (accumulating per-head partial
products across the head-block grid dimension) instead of a separate XLA
dot after the custom call — docs/KERNELS.md "scan idle gap". Parity is
pinned against unfused-kernel-then-dot in interpret mode, including the
Hb < H revisited-output accumulation and the full backward (dqkv, dwo).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.ops import build_rope3d_tables
from deepcoro_clip_tpu.ops import flash_attention_packed as fap

B, H, DH = 2, 2, 128
D = H * DH


def _mk(L, seed=0):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.normal(size=(B, L, D)), jnp.float32) * 0.3
    k = jnp.asarray(r.normal(size=(B, L, D)), jnp.float32) * 0.3
    v = jnp.asarray(r.normal(size=(B, L, D)), jnp.float32) * 0.3
    wo = jnp.asarray(r.normal(size=(D, D)), jnp.float32) * 0.1
    return q, k, v, wo


def _unfused(q, k, v, wo, **kw):
    out = fap.flash_attention_packed(q, k, v, num_heads=H,
                                     backend="interpret", **kw)
    return jnp.einsum("bld,do->blo", out, wo)


@pytest.mark.parametrize("mode", ["plain", "rope", "mask"])
def test_forward_matches_unfused(mode):
    L = 136  # pads to 256: padded-row handling under the fold
    q, k, v, wo = _mk(L)
    kw = {}
    if mode == "rope":
        t = build_rope3d_tables(DH, 2, 8, 8, n_special=L - 128)
        kw = dict(sin=jnp.asarray(t.sin), cos=jnp.asarray(t.cos))
    if mode == "mask":
        kw = dict(kv_mask=jnp.asarray(
            (np.arange(L) < L - 9)[None].repeat(B, 0).astype(np.int32)))
    y = fap.flash_attention_packed(q, k, v, num_heads=H, wo=wo,
                                   backend="interpret", **kw)
    ref = _unfused(q, k, v, wo, **kw)
    assert y.shape == (B, L, D)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_head_subblock_accumulation(monkeypatch):
    """Hb < H: y blocks are revisited across head-block grid steps and
    summed through the fp32 scratch — the cross-program accumulation the
    fold hinges on."""
    monkeypatch.setattr(fap, "_choose_packed",
                        lambda *a, **k: (1, 128))  # Hb=1 -> nhb=2
    q, k, v, wo = _mk(128, seed=9)
    y = fap.flash_attention_packed(q, k, v, num_heads=H, wo=wo,
                                   backend="interpret")
    ref = _unfused(q, k, v, wo)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_qkv_operand_with_wo():
    q, k, v, wo = _mk(128, seed=3)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    y = fap.flash_attention_packed(qkv=qkv, num_heads=H, wo=wo,
                                   backend="interpret")
    ref = _unfused(q, k, v, wo)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_grads_match_unfused():
    L = 136
    q, k, v, wo = _mk(L, seed=5)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    w = jnp.asarray(np.random.default_rng(6).normal(size=(B, L, D)),
                    jnp.float32)

    def f_fused(qkv, wo):
        y = fap.flash_attention_packed(qkv=qkv, num_heads=H, wo=wo,
                                       backend="interpret")
        return jnp.sum(y * w)

    def f_ref(qkv, wo):
        a, b, c = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
        return jnp.sum(_unfused(a, b, c, wo) * w)

    gf = jax.grad(f_fused, argnums=(0, 1))(qkv, wo)
    gr = jax.grad(f_ref, argnums=(0, 1))(qkv, wo)
    for a, b, name in zip(gf, gr, ("dqkv", "dwo")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"{name} mismatch")


def test_vmem_overflow_falls_back_to_unfused(monkeypatch):
    """When no fused config fits the VMEM budget, the wrapper silently
    runs kernel + XLA dot (same result)."""
    real = fap._choose_packed

    def fake(*a, **k):
        if k.get("proj_dout"):
            return None
        return real(*a, **k)

    monkeypatch.setattr(fap, "_choose_packed", fake)
    q, k, v, wo = _mk(128, seed=7)
    y = fap.flash_attention_packed(q, k, v, num_heads=H, wo=wo,
                                   backend="interpret")
    np.testing.assert_allclose(np.asarray(y), np.asarray(_unfused(q, k, v, wo)),
                               atol=5e-5, rtol=5e-5)


def test_layer_knob_same_params_and_output(monkeypatch):
    """Attention module: DEEPCORO_FUSED_OUTPROJ=1 keeps the exact param
    tree ("proj"/kernel+bias) and the same output as the dense path (CPU
    resolves to the XLA backend, where wo= is a plain dot — the wiring and
    checkpoint compatibility are what's under test here)."""
    from deepcoro_clip_tpu.models.layers import Attention

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, D)),
                    jnp.float32)
    mod = Attention(dim=D, num_heads=H, dtype=jnp.float32)

    monkeypatch.setenv("DEEPCORO_PACKED_ATTN", "1")
    monkeypatch.setenv("DEEPCORO_FUSED_OUTPROJ", "0")
    p_off = mod.init(jax.random.PRNGKey(0), x)
    y_off = mod.apply(p_off, x)

    monkeypatch.setenv("DEEPCORO_FUSED_OUTPROJ", "1")
    p_on = mod.init(jax.random.PRNGKey(0), x)
    y_on = mod.apply(p_on, x)

    flat_off = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, p_off))[0]
    flat_on = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, p_on))[0]
    assert [k for k, _ in flat_off] == [k for k, _ in flat_on]
    for (kp, a), (_, b) in zip(flat_off, flat_on):
        np.testing.assert_array_equal(a, b, err_msg=str(kp))
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               atol=1e-5, rtol=1e-5)
    # and the fused path still differentiates through proj params
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(p_on)
    gproj = jax.tree.leaves(g["params"]["proj"])
    assert all(np.isfinite(np.asarray(t)).all() for t in gproj)
    assert any(float(jnp.abs(t).max()) > 0 for t in gproj)


def test_xla_bwd_env_falls_back_to_unfused(monkeypatch):
    """DEEPCORO_FLASH_BWD=xla has no fused-proj bwd kernel: the wrapper
    must silently run unfused kernel + dot (same value, xla-bwd grads)."""
    monkeypatch.setenv("DEEPCORO_FLASH_BWD", "xla")
    q, k, v, wo = _mk(128, seed=11)
    y = fap.flash_attention_packed(q, k, v, num_heads=H, wo=wo,
                                   backend="interpret")
    np.testing.assert_allclose(np.asarray(y), np.asarray(_unfused(q, k, v, wo)),
                               atol=5e-5, rtol=5e-5)
