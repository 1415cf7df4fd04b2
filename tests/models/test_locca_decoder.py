"""LocCaDecoder (reference models/locca_decoder.py:56,135,223-455):
coordinate-conditioned cross-attention must solve localization tasks the
generic content-only decoder cannot."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from deepcoro_clip_tpu.models.captioning_decoder import CaptioningDecoder
from deepcoro_clip_tpu.models.locca_decoder import (
    LocCaDecoder,
    grid_coordinates,
    locca_token_grid,
    sinusoidal_positions,
)

GRID = (1, 4, 4)
LV = 16          # tokens
DV = 32          # vision dim
VOCAB = 24
L = 4            # caption length


def test_sinusoidal_positions_shape_and_range():
    pe = sinusoidal_positions(64, 32)
    assert pe.shape == (64, 32)
    assert np.all(np.abs(pe) <= 1.0)
    assert not np.allclose(pe[0], pe[1])


def test_grid_coordinates():
    c = grid_coordinates((2, 3, 3), n_special=1)
    assert c.shape == (1 + 18, 3)
    assert np.all(c[0] == 0)
    assert c[1:].min() == 0.0 and c[1:].max() == 1.0


def test_locca_token_grid_from_config():
    from deepcoro_clip_tpu.flagship import flagship_config

    cfg = flagship_config()
    grid, n_special = locca_token_grid(cfg)
    T, H, W = grid
    assert T == cfg.frames // cfg.vit_patch[0]
    assert n_special == 1
    # each pool stage halves H and W
    assert H == cfg.resize // cfg.vit_patch[1] // (2 ** len(cfg.vit_pool_stages))


def _localization_batches(rng, n_batches=40, B=32):
    """Memory: every token identical EXCEPT a hot token (same content vector
    wherever it is). Target caption token = hot POSITION. Content-only
    cross-attention cannot recover the position; coordinates can."""
    v0 = rng.normal(size=(DV,)).astype(np.float32) * 0.3
    v1 = rng.normal(size=(DV,)).astype(np.float32) * 0.3 + 1.0
    batches = []
    for _ in range(n_batches):
        pos = rng.integers(0, LV, B)
        mem = np.tile(v0, (B, LV, 1))
        mem[np.arange(B), pos] = v1
        ids = np.zeros((B, L), np.int32)
        ids[:, 0] = 1                      # BOS
        ids[:, 1] = 2 + pos                # target token encodes the position
        batches.append((jnp.asarray(mem), jnp.asarray(ids)))
    return batches


def _train_decoder(decoder, batches, steps=120, lr=3e-3):
    params = decoder.init(
        {"params": jax.random.PRNGKey(0)}, batches[0][1], batches[0][0]
    )["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, mem, ids):
        def loss_fn(p):
            logits = decoder.apply({"params": p}, ids, mem,
                                   deterministic=True)
            # predict token at position 1 from position 0
            logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32))
            return -jnp.take_along_axis(logp, ids[:, 1:2], 1).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for i in range(steps):
        mem, ids = batches[i % len(batches)]
        params, opt, loss = step(params, opt, mem, ids)

    @jax.jit
    def acc(params, mem, ids):
        logits = decoder.apply({"params": params}, ids, mem,
                               deterministic=True)
        return (jnp.argmax(logits[:, 0], -1) == ids[:, 1]).mean()

    accs = [float(acc(params, m, i)) for m, i in batches[:8]]
    return float(np.mean(accs))


@pytest.mark.slow
def test_location_conditioning_beats_generic_decoder():
    rng = np.random.default_rng(0)
    batches = _localization_batches(rng)
    common = dict(vocab_size=VOCAB, dim=32, depth=1, num_heads=2,
                  max_length=L, memory_dim=DV, dropout=0.0,
                  dtype=jnp.float32, use_flash=False)
    locca = LocCaDecoder(token_grid=GRID, n_special_tokens=0, **common)
    generic = CaptioningDecoder(**common)

    acc_locca = _train_decoder(locca, batches, steps=500)
    acc_generic = _train_decoder(generic, batches, steps=500)

    # content-only cross-attention can't tell WHERE the hot token is
    assert acc_generic < 0.4, acc_generic
    assert acc_locca > 0.8, acc_locca
    assert acc_locca > acc_generic + 0.4


def test_multi_video_memory_tiles_coordinates():
    """Multi-video memory [B, N*L, D] must still be conditioned (the
    per-video grid repeats N times); a non-multiple token count must fail
    loudly rather than silently train an unconditioned decoder."""
    dec = LocCaDecoder(vocab_size=VOCAB, dim=32, depth=1, num_heads=2,
                       max_length=L, memory_dim=DV, dropout=0.0,
                       dtype=jnp.float32, use_flash=False,
                       token_grid=GRID, n_special_tokens=0)
    ids = jnp.zeros((2, L), jnp.int32)
    mem2 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2 * LV, DV)),
                       jnp.float32)
    vars2 = dec.init({"params": jax.random.PRNGKey(0)}, ids, mem2)
    out = dec.apply(vars2, ids, mem2, deterministic=True)
    assert out.shape == (2, L, VOCAB)
    # conditioning actually applied: permuting the second video's tokens
    # changes the output (pure content-attention would too, but a zeroed
    # coord_emb would make the two videos' identical contents collapse)
    coord = vars2["params"]["coord_emb"]["kernel"]
    assert float(jnp.abs(coord).sum()) > 0.0

    mem_bad = mem2[:, : 2 * LV - 3]
    with pytest.raises(ValueError, match="coords"):
        dec.init({"params": jax.random.PRNGKey(0)}, ids, mem_bad)


def test_locca_token_grid_rounds_up_like_patchify():
    """PatchEmbed3D right-pads non-divisible inputs to a whole grid, so the
    coord grid must use ceil division (frames=15 with pt=2 -> T=8)."""
    from deepcoro_clip_tpu.flagship import flagship_config

    cfg = flagship_config()
    cfg.frames = 15
    cfg.vit_pool_stages = ()
    grid, _ = locca_token_grid(cfg)
    assert grid[0] == -(-15 // cfg.vit_patch[0])


def test_greedy_generation_works_with_locca_decoder():
    from deepcoro_clip_tpu.models.captioning_decoder import greedy_generate

    dec = LocCaDecoder(vocab_size=VOCAB, dim=32, depth=1, num_heads=2,
                       max_length=6, memory_dim=DV, dropout=0.0,
                       dtype=jnp.float32, use_flash=False,
                       token_grid=GRID, n_special_tokens=0)
    mem = jnp.asarray(np.random.default_rng(0).normal(size=(2, LV, DV)),
                      jnp.float32)
    ids = jnp.zeros((2, 6), jnp.int32)
    params = dec.init({"params": jax.random.PRNGKey(0)}, ids, mem)
    out = greedy_generate(dec, params, mem, bos_id=1, eos_id=2)
    assert out.shape == (2, 6)
    assert (out[:, 0] == 1).all()
