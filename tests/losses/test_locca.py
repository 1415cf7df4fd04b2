import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.losses.locca import (
    locca_combined_loss,
    locca_grounded_captioning_loss,
    locca_referring_expression_loss,
)


def _setup(B=2, L=8, V=16, seed=0):
    r = np.random.default_rng(seed)
    logits = jnp.asarray(r.normal(size=(B, L, V)).astype(np.float32))
    ids = jnp.asarray(r.integers(0, V, (B, L)).astype(np.int32))
    am = jnp.ones((B, L), jnp.int32)
    loc = jnp.asarray((r.random((B, L)) > 0.5).astype(np.int32))
    return logits, ids, am, loc


def test_referring_and_grounded_partition():
    """referring + grounded cover disjoint positions; combined with equal
    weights uses every position exactly once per task."""
    logits, ids, am, loc = _setup()
    ref = locca_referring_expression_loss(logits, ids, am, loc)
    grd = locca_grounded_captioning_loss(logits, ids, am, loc,
                                         label_smoothing=0.0)
    assert np.isfinite(float(ref)) and np.isfinite(float(grd))
    # all-location mask: grounded loss sees nothing -> 0 by masked-mean
    grd0 = locca_grounded_captioning_loss(logits, ids, am, jnp.ones_like(loc),
                                          label_smoothing=0.0)
    assert float(grd0) == pytest.approx(0.0, abs=1e-6)


def test_combined_without_locations_is_captioning():
    logits, ids, am, _ = _setup()
    out = locca_combined_loss(logits, ids, am, location_mask=None)
    assert float(out["total"]) == pytest.approx(float(out["captioning"]))
    assert "referring" not in out


def test_combined_weights():
    logits, ids, am, loc = _setup()
    out = locca_combined_loss(
        logits, ids, am, loc,
        weights={"captioning": 1.0, "referring": 2.0, "grounded": 0.5},
    )
    want = (float(out["captioning"]) + 2.0 * float(out["referring"])
            + 0.5 * float(out["grounded"]))
    assert float(out["total"]) == pytest.approx(want, rel=1e-6)
