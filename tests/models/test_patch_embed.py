"""PatchEmbed3D (space-to-depth matmul) must equal the strided conv it
replaced — same params, same output — and keep the nn.Conv param tree."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.models.layers import PatchEmbed3D


class _ConvRef(nn.Module):
    dim: int
    patch: tuple

    @nn.compact
    def __call__(self, x):
        pt, ph, pw = self.patch
        x = nn.Conv(self.dim, kernel_size=(pt, ph, pw),
                    strides=(pt, ph, pw), padding="VALID",
                    dtype=jnp.float32, param_dtype=jnp.float32,
                    name="conv")(x)
        B, T, H, W, D = x.shape
        return x.reshape(B, T * H * W, D), (T, H, W)


def test_matches_strided_conv_and_param_tree():
    patch, dim = (2, 16, 16), 32
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 4, 32, 32, 3)).astype(np.float32))

    pe = PatchEmbed3D(dim, patch, dtype=jnp.float32)
    params = pe.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"conv"}
    assert params["conv"]["kernel"].shape == (2, 16, 16, 3, dim)
    assert params["conv"]["bias"].shape == (dim,)

    out, (T, H, W) = pe.apply({"params": params}, x)
    ref, (Tr, Hr, Wr) = _ConvRef(dim, patch).apply({"params": params}, x)
    assert (T, H, W) == (Tr, Hr, Wr) == (2, 2, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_conv():
    patch, dim = (2, 8, 8), 16
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 2, 16, 16, 3)).astype(np.float32))
    pe = PatchEmbed3D(dim, patch, dtype=jnp.float32)
    params = pe.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, mod):
        out, _ = mod.apply({"params": p}, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_new = jax.grad(loss)(params, pe)
    g_ref = jax.grad(loss)(params, _ConvRef(dim, patch))
    for k in ("kernel", "bias"):
        np.testing.assert_allclose(
            np.asarray(g_new["conv"][k]), np.asarray(g_ref["conv"][k]),
            rtol=1e-4, atol=1e-4)


def test_non_divisible_input_pads():
    pe = PatchEmbed3D(8, (2, 8, 8), dtype=jnp.float32)
    x = jnp.ones((1, 3, 17, 17, 3), jnp.float32)
    params = pe.init(jax.random.PRNGKey(0), x)["params"]
    out, (T, H, W) = pe.apply({"params": params}, x)
    assert (T, H, W) == (2, 3, 3) and out.shape == (1, 18, 8)
