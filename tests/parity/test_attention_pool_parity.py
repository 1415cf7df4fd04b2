"""AttentionPool weight-transplant parity vs the reference.

The reference pooling head (reference: models/attention_pool.py:10-101) is
learnable-query MultiheadAttention -> LayerNorm -> optional Linear. This
repo's flax module (models/attention_pool.py) is the same architecture;
the test copies the torch module's randomly initialized weights into the
flax tree and asserts the forwards agree.

Reparameterizations handled by the transplant (not divergences):
- torch `in_proj_weight [3D, D]` splits by rows into the q/k/v kernels
  (each transposed to flax's [in, out]);
- mask conventions are inverted (reference key_padding_mask True = PAD,
  this repo True = keep).

AttentionPoolWithCLS is deliberately NOT transplant-comparable: the
reference wraps torch's legacy `nn.TransformerEncoderLayer` defaults
(post-norm, ReLU, dim_feedforward=2048) while every tower in this repo is
pre-LN/GELU (docs/PARITY.md "Remaining deliberate divergences"). Its
contract (CLS prepended, mask extended, CLS output normed/projected) is
covered by tests/models/.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from deepcoro_clip_tpu.models.attention_pool import AttentionPool

D, HEADS, B, L = 64, 4, 3, 9


def _torch_pool(reference, output_dim=None):
    import importlib

    mod = importlib.import_module("models.attention_pool")
    torch.manual_seed(0)
    return mod.AttentionPool(
        embed_dim=D, num_heads=HEADS, output_dim=output_dim, dropout=0.0
    ).eval()


def _transplant(tm, output_dim=None) -> dict:
    """The shipped converter mapping (utils/torch_import.py) — this test is
    its measured oracle. ``output_dim`` is inferred from the state dict."""
    from deepcoro_clip_tpu.utils.torch_import import (
        attention_pool_to_flax, numpy_state_dict,
    )

    return attention_pool_to_flax(numpy_state_dict(tm.state_dict()))


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("output_dim", [None, 16])
def test_attention_pool_matches_reference(reference, masked, output_dim):
    tm = _torch_pool(reference, output_dim)
    r = np.random.default_rng(4)
    x = r.normal(size=(B, L, D)).astype(np.float32)
    keep = np.ones((B, L), bool)
    if masked:
        keep[0, 5:] = False
        keep[2, 2:] = False

    with torch.no_grad():
        want = tm(
            torch.from_numpy(x),
            mask=None if not masked else torch.from_numpy(~keep),
        ).numpy()

    fm = AttentionPool(dim=D, num_heads=HEADS, dropout=0.0,
                       output_dim=output_dim, dtype=jnp.float32,
                       use_flash=False)
    got = np.asarray(fm.apply(
        {"params": _transplant(tm, output_dim)},
        jnp.asarray(x),
        mask=None if not masked else jnp.asarray(keep),
        deterministic=True,
    ))
    assert got.shape == want.shape == (B, output_dim or D)
    np.testing.assert_allclose(got, want, atol=2e-5)
