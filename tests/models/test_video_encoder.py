"""Output-contract tests for VideoEncoder, mirroring the reference's
``test_video_encoder_tokens.py`` shape matrix (aggregate / per_video_pool)
and ``templates.py`` batch-independence-by-gradient-masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.models.video_encoder import CoroViT, VideoEncoder

B, N, T, H, W, C = 2, 3, 4, 32, 32, 3
DIM, DEPTH, HEADS = 64, 2, 2
EMB = 32


def tiny_encoder(**kw):
    defaults = dict(
        embedding_dim=EMB,
        backbone_dim=DIM,
        depth=DEPTH,
        backbone_heads=HEADS,
        patch=(2, 16, 16),
        num_heads=2,
        aggregator_depth=1,
        dropout=0.0,
        use_flash=False,
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return VideoEncoder(**defaults)


def _x(seed=0, n=N):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, n, T, H, W, C)).astype(np.float32)
    )


L = (T // 2) * (H // 16) * (W // 16)  # tokens per clip (no CLS)


def test_study_embedding_shape():
    m = tiny_encoder(aggregate_videos_tokens=True)
    out, _ = m.init_with_output(jax.random.PRNGKey(0), _x())
    assert out.shape == (B, EMB)


def test_per_video_shape():
    m = tiny_encoder(aggregate_videos_tokens=False, per_video_pool=True)
    out, _ = m.init_with_output(jax.random.PRNGKey(0), _x())
    assert out.shape == (B, N, EMB)


def test_patch_tokens_shape():
    m = tiny_encoder(aggregate_videos_tokens=False, per_video_pool=False,
                     use_cls_token=False)
    out, _ = m.init_with_output(jax.random.PRNGKey(0), _x())
    assert out.shape == (B, N * L, EMB)


def test_cls_token_adds_one_token():
    m = tiny_encoder(aggregate_videos_tokens=False, per_video_pool=False,
                     use_cls_token=True)
    out, _ = m.init_with_output(jax.random.PRNGKey(0), _x())
    assert out.shape == (B, N * (L + 1), EMB)


def test_5d_input_auto_expands():
    m = tiny_encoder(aggregate_videos_tokens=True)
    x5 = _x()[:, 0]
    out, _ = m.init_with_output(jax.random.PRNGKey(0), x5)
    assert out.shape == (B, EMB)


@pytest.mark.parametrize("mode", ["mean", "attention", "cls_token"])
def test_pooling_modes(mode):
    m = tiny_encoder(
        aggregate_videos_tokens=False, per_video_pool=True,
        pooling_mode=mode, use_cls_token=True,
    )
    out, _ = m.init_with_output(jax.random.PRNGKey(0), _x())
    assert out.shape == (B, N, EMB)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_get_tokens_modes():
    m = tiny_encoder(aggregate_videos_tokens=True)
    params = m.init(jax.random.PRNGKey(0), _x())
    patch = m.apply(params, _x(), mode="patch", method=m.get_tokens)
    video = m.apply(params, _x(), mode="video", method=m.get_tokens)
    study = m.apply(params, _x(), mode="study", method=m.get_tokens)
    assert patch.shape == (B, N, L + 1, EMB)
    assert video.shape == (B, N, EMB)
    assert study.shape == (B, EMB)


def test_batch_independence_via_gradient_masking():
    """Masking one sample's loss must zero its input gradient exactly
    (reference: tests/templates.py:46-90)."""
    m = tiny_encoder(aggregate_videos_tokens=True)
    x = _x()
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(x):
        out = m.apply(params, x)
        return jnp.sum(out[0] ** 2)  # only sample 0 contributes

    g = jax.grad(loss)(x)
    assert float(jnp.max(jnp.abs(g[1]))) == 0.0
    assert float(jnp.max(jnp.abs(g[0]))) > 0.0


def test_video_mask_zeroes_padded_slots():
    """A zero-padded video slot with mask=False must not change the study
    embedding (reference zero-pads missing videos,
    dataloaders/video_clip_dataset.py:597-646)."""
    m = tiny_encoder(aggregate_videos_tokens=True, dropout=0.0)
    x = _x()
    mask_full = jnp.ones((B, N), bool)
    params = m.init(jax.random.PRNGKey(0), x, video_mask=mask_full)

    x_pad = x.at[:, -1].set(0.0)
    mask = jnp.array([[True, True, False]] * B)
    out_masked = m.apply(params, x_pad, video_mask=mask)
    x_other = x_pad.at[:, -1].set(123.0)
    out_masked2 = m.apply(params, x_other, video_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_masked2), rtol=2e-4, atol=2e-5
    )


def test_multiscale_pool_stage():
    m = CoroViT(dim=DIM, depth=3, num_heads=2, patch=(2, 16, 16),
                pool_stages=(1,), use_cls_token=True, dtype=jnp.float32,
                use_flash=False)
    x = jnp.zeros((2, T, H, W, C))
    out, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    # after one 2x2 spatial pool: T'*(H'/2)*(W'/2) = 2*1*1 = 2 tokens + CLS
    assert out.shape == (2, 1 + 2, DIM)
