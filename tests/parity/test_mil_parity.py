"""MultiInstanceLinearProbing weight-transplant parity vs the reference.

Copies the reference module's randomly initialized weights
(reference: models/multi_instance_linear_probing.py:82-544) into this repo's
flax MIL head (models/mil.py) and asserts identical logits for the pooling
modes whose architecture is shared 1:1: ``mean`` / ``max`` / ``attention``
(gated tanh·sigmoid), including the hierarchical 4D attention path (which
the reference computes with ONE shared attention_V/U/w across both levels —
matched here via separate_video_attention=False) and EchoJEPA view
embeddings.

The ``cls_token`` family is a documented re-design (reference: bare
nn.MultiheadAttention + LayerNorm stack, :351-478; here a pre-LN
transformer block) — heads there train from scratch on frozen embeddings,
so family-level equivalence is the spec, not weight parity (docs/PARITY.md).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from deepcoro_clip_tpu.models.mil import MultiInstanceLinearProbing

D, N, B, HID = 32, 5, 4, 16
HEADS = {"stenosis": 1, "vessel": 3}


def _reference_mil(reference, pooling_mode, num_view_classes=0):
    import importlib

    mod = importlib.import_module("models.multi_instance_linear_probing")
    torch.manual_seed(0)
    m = mod.MultiInstanceLinearProbing(
        embedding_dim=D, head_structure=dict(HEADS),
        pooling_mode=pooling_mode, attention_hidden=HID, dropout=0.0,
        num_view_classes=num_view_classes,
    )
    return m.eval()


def _transplant(tm, pooling_mode, gated_scope="across") -> dict:
    """The shipped converter mapping (utils/torch_import.py) — this test is
    its measured oracle. ``pooling_mode`` is inferred from the state dict."""
    from deepcoro_clip_tpu.utils.torch_import import (
        mil_to_flax, numpy_state_dict,
    )

    return mil_to_flax(numpy_state_dict(tm.state_dict()),
                       gated_scope=gated_scope)


def _ours(pooling_mode, separate=True, use_view=False, num_view_classes=0):
    return MultiInstanceLinearProbing(
        embedding_dim=D, head_structure=dict(HEADS),
        pooling_mode=pooling_mode, attention_hidden=HID,
        dropout=0.0, dropout_attention=0.0,
        separate_video_attention=separate,
        use_view_embeddings=use_view, num_view_classes=num_view_classes,
        dtype=jnp.float32,
    )


@pytest.mark.parametrize("mode", ["mean", "max", "attention"])
def test_3d_pooling_logits_match(reference, mode):
    tm = _reference_mil(reference, mode)
    r = np.random.default_rng(4)
    x = r.normal(size=(B, N, D)).astype(np.float32)
    keep = np.ones((B, N), bool)
    keep[0, 2:] = False
    keep[3, 4:] = False

    with torch.no_grad():
        want = tm(torch.from_numpy(x), mask=torch.from_numpy(keep))

    got = _ours(mode).apply(
        {"params": _transplant(tm, mode)},
        jnp.asarray(x), mask=jnp.asarray(keep), deterministic=True,
    )
    assert set(got) == set(want)
    for h in HEADS:
        np.testing.assert_allclose(
            np.asarray(got[h]), want[h].numpy(), rtol=1e-5, atol=1e-5
        )


def test_hierarchical_attention_shares_weights_like_reference(reference):
    """Reference hierarchical attention reuses ONE attention_V/U/w at both
    levels (:509-536) — matched with separate_video_attention=False."""
    tm = _reference_mil(reference, "attention")
    r = np.random.default_rng(5)
    L = 3
    x = r.normal(size=(B, N, L, D)).astype(np.float32)
    keep = np.ones((B, N), bool)
    keep[1, 3:] = False

    with torch.no_grad():
        want = tm(torch.from_numpy(x), mask=torch.from_numpy(keep))

    got = _ours("attention", separate=False).apply(
        {"params": _transplant(tm, "attention", gated_scope="shared")},
        jnp.asarray(x), mask=jnp.asarray(keep), deterministic=True,
    )
    for h in HEADS:
        np.testing.assert_allclose(
            np.asarray(got[h]), want[h].numpy(), rtol=1e-5, atol=1e-5
        )


def test_view_embeddings_match(reference):
    nvc = 6
    tm = _reference_mil(reference, "attention", num_view_classes=nvc)
    r = np.random.default_rng(6)
    x = r.normal(size=(B, N, D)).astype(np.float32)
    keep = np.ones((B, N), bool)
    keep[2, 1:] = False
    view_ids = r.integers(0, nvc, size=(B, N)).astype(np.int32)
    view_ids[~keep] = nvc  # PAD id (reference view_pad_id = num_view_classes)

    with torch.no_grad():
        want = tm(torch.from_numpy(x), mask=torch.from_numpy(keep),
                  view_ids=torch.from_numpy(view_ids.astype(np.int64)))

    got = _ours("attention", use_view=True, num_view_classes=nvc).apply(
        {"params": _transplant(tm, "attention")},
        jnp.asarray(x), mask=jnp.asarray(keep),
        view_ids=jnp.asarray(view_ids), deterministic=True,
    )
    for h in HEADS:
        np.testing.assert_allclose(
            np.asarray(got[h]), want[h].numpy(), rtol=1e-5, atol=1e-5
        )
