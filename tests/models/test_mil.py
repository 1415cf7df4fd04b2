"""MultiInstanceLinearProbing tests (reference:
tests/test_multi_instance_linear_probing.py — 503 LoC: every pooling mode,
masks, hybrid dims, view embeddings, hierarchical input)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.models.mil import MultiInstanceLinearProbing

B, N, D = 3, 4, 32
HEADS = {"stenosis": 1, "severity": 3}


def make(mode="mean", **kw):
    d = dict(
        embedding_dim=D, head_structure=dict(HEADS), pooling_mode=mode,
        attention_hidden=16, num_heads=2, dtype=jnp.float32, use_flash=False,
    )
    d.update(kw)
    return MultiInstanceLinearProbing(**d)


def _x(seed=0, shape=(B, N, D)):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape)
                       .astype(np.float32))


@pytest.mark.parametrize(
    "mode", ["mean", "max", "attention", "cls_token",
             "mean+cls_token", "attention+cls_token"]
)
def test_all_pooling_modes_shapes(mode):
    m = make(mode)
    out, _ = m.init_with_output(jax.random.PRNGKey(0), _x())
    assert set(out) == set(HEADS)
    assert out["stenosis"].shape == (B, 1)
    assert out["severity"].shape == (B, 3)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in out.values())


@pytest.mark.parametrize("mode", ["mean", "attention", "cls_token"])
def test_mask_excludes_padded_instances(mode):
    m = make(mode, dropout=0.0, dropout_attention=0.0)
    x = _x()
    mask = jnp.asarray(np.array([[1, 1, 0, 0]] * B, bool))
    params = m.init(jax.random.PRNGKey(0), x, mask=mask)
    o1 = m.apply(params, x, mask=mask)
    x2 = x.at[:, 2:].set(77.0)  # change masked instances
    o2 = m.apply(params, x2, mask=mask)
    for h in HEADS:
        np.testing.assert_allclose(
            np.asarray(o1[h]), np.asarray(o2[h]), rtol=1e-4, atol=1e-5
        )


def test_all_masked_fallback_is_finite():
    m = make("attention")
    x = _x()
    mask = jnp.zeros((B, N), bool)
    out, _ = m.init_with_output(jax.random.PRNGKey(0), x, mask=mask)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in out.values())


def test_view_embeddings_change_output():
    m = make("mean", use_view_embeddings=True, num_view_classes=5)
    x = _x()
    v1 = jnp.zeros((B, N), jnp.int32)
    v2 = jnp.ones((B, N), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, view_ids=v1)
    o1 = m.apply(params, x, view_ids=v1)
    o2 = m.apply(params, x, view_ids=v2)
    assert not np.allclose(np.asarray(o1["stenosis"]), np.asarray(o2["stenosis"]))


def test_hierarchical_4d_input():
    L = 6
    m = make("attention", hierarchical=True)
    x = _x(shape=(B, N, L, D))
    out, params = m.init_with_output(jax.random.PRNGKey(0), x)
    assert out["stenosis"].shape == (B, 1)
    # separate within/across params exist
    names = set(params["params"].keys())
    assert any("within" in n for n in names)
    assert any("across" in n for n in names)


def test_shared_attention_weights():
    L = 6
    m = make("attention", hierarchical=True, separate_video_attention=False)
    x = _x(shape=(B, N, L, D))
    out, params = m.init_with_output(jax.random.PRNGKey(0), x)
    names = set(params["params"].keys())
    assert any("shared" in n for n in names)
    assert not any("within" in n for n in names)


def test_attention_weights_sown():
    m = make("attention")
    x = _x()
    params = m.init(jax.random.PRNGKey(0), x)
    _, inter = m.apply(params, x, mutable=["intermediates"])
    att = inter["intermediates"]["across_attention"][0]
    assert att.shape == (B, N)
    np.testing.assert_allclose(np.asarray(att.sum(-1)), 1.0, rtol=1e-5)


def test_gradients_do_not_touch_other_heads():
    """Per-head Linear isolation: stenosis loss has no grad on severity head."""
    m = make("mean")
    x = _x()
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(m.apply(p, x)["stenosis"] ** 2)

    import flax.linen as nn

    g = nn.meta.unbox(jax.grad(loss)(params))
    sev = g["params"]["head_severity"]["kernel"]
    assert float(jnp.max(jnp.abs(sev))) == 0.0
