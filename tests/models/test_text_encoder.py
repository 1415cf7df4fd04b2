import jax
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.models.text_encoder import TextEncoder


def tiny_text(**kw):
    d = dict(
        embedding_dim=32, vocab_size=100, dim=48, depth=2, num_heads=2,
        max_positions=16, dropout=0.0, proj_dropout=0.0,
        dtype=jnp.float32, use_flash=False,
    )
    d.update(kw)
    return TextEncoder(**d)


def _ids(B=2, L=10, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, 100, size=(B, L)).astype(np.int32))


def test_output_shape():
    m = tiny_text()
    out, _ = m.init_with_output(jax.random.PRNGKey(0), _ids())
    assert out.shape == (2, 32)


def test_padding_mask_invariance():
    """Embedding must not depend on token values behind the padding mask."""
    m = tiny_text()
    ids = _ids()
    mask = jnp.asarray(np.array([[1] * 6 + [0] * 4, [1] * 8 + [0] * 2]))
    params = m.init(jax.random.PRNGKey(0), ids, attention_mask=mask)
    out1 = m.apply(params, ids, attention_mask=mask)
    ids2 = ids.at[:, 8:].set(7)  # change padded positions
    out2 = m.apply(params, ids2, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_batch_independence():
    m = tiny_text()
    ids = _ids()
    params = m.init(jax.random.PRNGKey(0), ids)

    def loss(emb_table):
        p = {"params": {**params["params"], "word_embeddings": emb_table}}
        out = m.apply(p, ids)
        return jnp.sum(out[0] ** 2)

    # gradient w.r.t. sample-1-only tokens must be zero
    ids_only_in_1 = set(np.asarray(ids[1]).tolist()) - set(np.asarray(ids[0]).tolist())
    g = jax.grad(lambda p: jnp.sum(m.apply(p, ids)[0] ** 2))(params)
    emb_g = g["params"]["word_embeddings"]["embedding"]
    for tok in ids_only_in_1:
        assert float(jnp.max(jnp.abs(emb_g[tok]))) == 0.0


def test_epilogue_barrier_is_numerics_transparent(monkeypatch):
    """DEEPCORO_EPILOGUE_BARRIER only splits XLA fusions; values and grads
    must be bit-identical in fp32 (models/layers.py::epilogue_barrier)."""
    m = tiny_text()
    ids = _ids()
    params = m.init(jax.random.PRNGKey(0), ids)

    def run():
        def loss(p):
            return jnp.sum(m.apply(p, ids).astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        return float(l), [np.asarray(x) for x in leaves]

    monkeypatch.setenv("DEEPCORO_EPILOGUE_BARRIER", "0")
    l0, g0 = run()
    monkeypatch.setenv("DEEPCORO_EPILOGUE_BARRIER", "1")
    l1, g1 = run()
    assert l0 == l1
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(a, b)
