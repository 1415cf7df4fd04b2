"""Freeze-mask semantics (reference: models/video_encoder.py:442-455).

``ratio`` is the trainable-from-the-top fraction: ratio 0.8 freezes the
BOTTOM ~20% of the backbone, never proj/aggregator; ratio 1.0 is the
full-freeze special case (reference linear-probing convention,
projects/linear_probing_project.py:203-206); ratio 0.0 — the config
default — freezes NOTHING (reference encoder docstring convention,
models/video_encoder.py:461).  Round-1 ADVICE found the partial-ratio
semantics inverted — these tests pin the corrected behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.train import optim as optim_lib


def _params():
    # Param-count layout: patch_embed 10, block0 30, block1 30, norm 10
    # (backbone total 80), plus proj 100 and aggregator 50 outside.
    z = lambda n: jnp.zeros((n,), jnp.float32)
    return {
        "backbone": {
            "norm": z(10),
            "patch_embed": z(10),
            "block1": z(30),
            "block0": z(30),
        },
        "proj": {"kernel": z(100)},
        "aggregator": {"query": z(50)},
    }


def _frozen_names(params, fracs, ratio):
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = optim_lib.apply_freeze_mask(ones, fracs, ratio)
    flat = jax.tree_util.tree_flatten_with_path(masked)[0]
    out = set()
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if float(jnp.sum(leaf)) == 0.0:
            out.add(name)
    return out


def test_ratio_is_trainable_fraction_from_top():
    p = _params()
    fracs = optim_lib.freeze_fractions(p, include=("backbone",))
    # ratio 0.8 -> freeze bottom 20% of 80 = first 16 params:
    # patch_embed (start 0.0) frozen; block0 (start 10/80=0.125) frozen
    # (0.125 < 0.2); block1 (start 0.5) and norm (0.875) trainable.
    frozen = _frozen_names(p, fracs, 0.8)
    assert frozen == {"backbone/patch_embed", "backbone/block0"}


def test_module_order_patch_embed_first_norm_last():
    p = _params()
    fracs = optim_lib.freeze_fractions(p, include=("backbone",))
    assert float(fracs["backbone"]["patch_embed"]) == 0.0
    assert (
        float(fracs["backbone"]["patch_embed"])
        < float(fracs["backbone"]["block0"])
        < float(fracs["backbone"]["block1"])
        < float(fracs["backbone"]["norm"])
    )


def test_heads_never_partially_frozen():
    p = _params()
    fracs = optim_lib.freeze_fractions(p, include=("backbone",))
    # Even at ratio ~0 (all of backbone frozen), proj/aggregator train.
    frozen = _frozen_names(p, fracs, 0.001)
    assert not any(n.startswith(("proj", "aggregator")) for n in frozen)
    assert any(n.startswith("backbone") for n in frozen)


def test_ratio_one_full_freeze_includes_heads():
    p = _params()
    fracs = optim_lib.freeze_fractions(p, include=("backbone",))
    ones = jax.tree_util.tree_map(jnp.ones_like, p)
    masked = optim_lib.apply_freeze_mask(ones, fracs, 1.0)
    assert all(float(jnp.sum(l)) == 0.0 for l in jax.tree_util.tree_leaves(masked))


def test_ratio_zero_freezes_nothing():
    # the config default: 0.0 means "no freezing" (reference encoder
    # docstring convention, models/video_encoder.py:461) — NOT full freeze,
    # which is spelled ratio 1.0 (linear-probing convention).
    p = _params()
    fracs = optim_lib.freeze_fractions(p, include=("backbone",))
    assert _frozen_names(p, fracs, 0.0) == set()
    assert _frozen_names(p, fracs, -1.0) == set()


def test_exclude_variant_for_text_tower():
    p = {
        "word_embeddings": jnp.zeros((10,)),
        "layer0": {"w": jnp.zeros((20,))},
        "layer1": {"w": jnp.zeros((20,))},
        "proj": {"kernel": jnp.zeros((100,))},
    }
    fracs = optim_lib.freeze_fractions(p, exclude=("proj",))
    frozen = _frozen_names(p, fracs, 0.001)
    assert not any(n.startswith("proj") for n in frozen)
    assert float(fracs["word_embeddings"]) == 0.0  # embeddings at the bottom


def test_frozen_leaves_accumulate_no_adam_moments():
    import optax

    p = _params()
    fracs = optim_lib.freeze_fractions(p, include=("backbone",))
    tx = optax.adam(1e-2)
    opt_state = tx.init(p)
    grads = jax.tree_util.tree_map(jnp.ones_like, p)
    # Mask grads BEFORE update (as train/clip.py does): frozen leaves must
    # keep exactly-zero first/second moments.
    masked_grads = {
        **grads,
        "backbone": optim_lib.apply_freeze_mask(grads["backbone"],
                                                fracs["backbone"], 0.8),
    }
    _, opt_state = tx.update(masked_grads, opt_state, p)
    mu = opt_state[0].mu
    assert float(jnp.sum(jnp.abs(mu["backbone"]["patch_embed"]))) == 0.0
    assert float(jnp.sum(jnp.abs(mu["backbone"]["norm"]))) > 0.0
