"""CaptioningDecoder weight-transplant parity vs the reference.

The reference decoder (reference: models/captioning_decoder.py:11-335) is
pre-LN: embeddings (token + learned position -> LayerNorm -> dropout), then
per layer LN -> causal self-MHA -> residual, LN -> cross-MHA into the video
tokens -> residual, LN -> GELU FFN -> residual, then a final LN and a
bias-free lm_head. This repo's flax decoder is the same architecture; the
transplant (utils/torch_import.captioning_decoder_to_flax) sets the extra
``memory_proj`` to identity and the lm_head bias to zero — both exact.

Tolerance: the FFN GELU here is the tanh approximation vs torch's exact erf
(documented divergence, docs/PARITY.md) — logits compared at atol 2e-2 over
a |logit| range of ~1 (mean abs error bound 2e-3 keeps it honest).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from deepcoro_clip_tpu.models.captioning_decoder import (
    CaptioningDecoder, greedy_generate_kv,
)

V, D, DEPTH, HEADS, B, L, LV = 50, 32, 2, 2, 3, 7, 5


def _reference_decoder(reference):
    import importlib

    mod = importlib.import_module("models.captioning_decoder")
    torch.manual_seed(0)
    m = mod.CaptioningDecoder(
        vocab_size=V, hidden_size=D, num_layers=DEPTH, num_heads=HEADS,
        intermediate_size=4 * D, max_position_embeddings=L, dropout=0.0,
        use_biomed_tokenizer=False,
    )
    return m.eval()


def _ours():
    return CaptioningDecoder(
        vocab_size=V, dim=D, depth=DEPTH, num_heads=HEADS, max_length=L,
        memory_dim=D, dropout=0.0, dtype=jnp.float32, use_flash=False,
    )


def _params(tm):
    from deepcoro_clip_tpu.utils.torch_import import (
        captioning_decoder_to_flax, numpy_state_dict,
    )

    return captioning_decoder_to_flax(numpy_state_dict(tm.state_dict()))


def test_decoder_logits_match_reference(reference):
    tm = _reference_decoder(reference)
    r = np.random.default_rng(0)
    ids = r.integers(1, V, (B, L)).astype(np.int32)
    video = r.normal(size=(B, LV, D)).astype(np.float32)

    with torch.no_grad():
        want = tm(
            input_ids=torch.tensor(ids, dtype=torch.long),
            video_features=torch.from_numpy(video),
        )["logits"].numpy()

    got = np.asarray(_ours().apply(
        {"params": _params(tm)}, jnp.asarray(ids), jnp.asarray(video),
        deterministic=True,
    ))
    assert got.shape == want.shape == (B, L, V)
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert float(np.abs(got - want).mean()) < 2e-3


def test_kv_cache_generation_runs_on_transplanted_weights(reference):
    """The functional KV-cache path reads the same param tree (incl. the new
    embed_norm) — generate a few tokens and check they match the reference's
    step-by-step argmax decode."""
    tm = _reference_decoder(reference)
    r = np.random.default_rng(1)
    video = r.normal(size=(1, LV, D)).astype(np.float32)
    params = {"params": _params(tm)}

    ids = greedy_generate_kv(
        _ours(), params, jnp.asarray(video), bos_id=1, eos_id=V - 1,
        max_length=L,
    )
    ids = np.asarray(ids)

    # reference greedy argmax, re-running the full decoder each step
    cur = torch.tensor([[1]], dtype=torch.long)
    with torch.no_grad():
        for _ in range(L - 1):
            logits = tm(input_ids=cur,
                        video_features=torch.from_numpy(video))["logits"]
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            cur = torch.cat([cur, nxt], dim=1)
            if int(nxt[0, 0]) == V - 1:
                break
    want = cur.numpy()[0]
    n = min(len(want), ids.shape[1])
    np.testing.assert_array_equal(ids[0, :n], want[:n])
