"""Optimizer assembly: per-component param groups, grad clipping, freeze masks.

Reference behavior reproduced:
- per-component LRs/weight-decays — text encoder at its own lr, attention-pool
  & aggregator at 2x base lr (reference:
  projects/contrastive_pretraining_project.py:137-179);
- optimizer selected by name (reference :182-186) — mapped to optax;
- per-encoder gradient clipping knobs ``video_max_grad_norm`` /
  ``text_max_grad_norm`` (reference: config/clip/siglip_ddp_config.yaml);
- partial freezing by parameter-count ratio with DYNAMIC ratio schedules
  (reference: models/video_encoder.py:442-491). TPU twist: the freeze mask is
  a comparison between a static per-leaf cumulative fraction and a *traced*
  ratio scalar, so freeze schedules run inside the jitted train step without
  recompilation.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

PyTree = Any


# Sentinel start-fraction for leaves OUTSIDE the freezable subtree (proj,
# aggregator, pools): larger than any possible (1 - ratio) threshold, so
# they are never frozen by a partial ratio — matching the reference, whose
# _freeze_partial_layers only walks self.model / self.bert
# (reference: models/video_encoder.py:442-455, models/text_encoder.py:70-84).
_NEVER_FROZEN = 2.0

# Depth-order patterns: embeddings / patchify first, numbered blocks next,
# trailing norms last — the true module order of both towers.
_BLOCK_PAT = re.compile(r"(?:block|layer)(\d+)")
_EMBED_PAT = re.compile(
    r"patch_embed|word_embeddings|position_embeddings|token_type|embeddings"
)


def _freeze_order_key(name: str):
    m = _BLOCK_PAT.search(name)
    if m:
        return (1, int(m.group(1)), name)
    if _EMBED_PAT.search(name):
        return (0, 0, name)
    return (2, 0, name)  # final norm etc. — the top of the tower


def freeze_fractions(
    params: PyTree,
    include: Optional[Tuple[str, ...]] = None,
    exclude: Tuple[str, ...] = (),
) -> PyTree:
    """Per-leaf cumulative start fraction of the FREEZABLE parameter count,
    in true module order (patch_embed/embeddings -> block0..blockN -> norm).

    ``include`` restricts freezing to top-level subtrees (e.g. ``("backbone",)``
    for the video tower); ``exclude`` drops top-level subtrees (e.g.
    ``("proj",)`` for the text tower, whose BERT body sits at top level).
    Leaves outside the freezable set get the ``_NEVER_FROZEN`` sentinel.

    Semantics (matching the reference, models/video_encoder.py:442-455):
    ``ratio`` is the TRAINABLE-from-the-top fraction; a leaf is FROZEN when
    ``start_frac < 1 - ratio`` (ratio 0.9 freezes the bottom ~10%).  See
    ``apply_freeze_mask`` for the ratio==1.0 full-freeze special case.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    named = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        top = name.split("/", 1)[0]
        freezable = (include is None or top in include) and top not in exclude
        named.append((name, leaf, freezable))

    ordered = sorted(
        (n for n in named if n[2]), key=lambda t: _freeze_order_key(t[0])
    )
    total = sum(int(leaf.size) for _, leaf, _ in ordered)
    fracs: Dict[str, float] = {name: _NEVER_FROZEN for name, _, _ in named}
    cum = 0
    for name, leaf, _ in ordered:
        fracs[name] = cum / max(total, 1)
        cum += int(leaf.size)

    def leaf_frac(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        return jnp.float32(fracs[name])

    return jax.tree_util.tree_map_with_path(leaf_frac, params)


def apply_freeze_mask(updates: PyTree, fracs: PyTree, ratio) -> PyTree:
    """Zero updates for frozen leaves (ratio may be a traced scalar).

    Conventions (the reference holds all three at once):
    - ``ratio <= 0.0``: NO freezing — the reference encoder docstring's
      "0.0 = all trainable" (models/video_encoder.py:461) and this repo's
      config default. (The reference's *code* at ratio exactly 0 would
      freeze everything; that reading would make the default config train
      nothing, so the docstring convention wins.)
    - ``0 < ratio < 1``: bottom-up partial freeze — frozen when
      ``start_frac < 1 - ratio``, i.e. ratio is the trainable-from-the-top
      fraction (models/video_encoder.py:442-455: ratio 0.87 keeps the top
      87% trainable).
    - ``ratio >= 1.0``: full freeze of the whole tower — the reference's
      linear-probing convention (projects/linear_probing_project.py:203-206),
      which overrides even never-frozen heads like proj.
    """
    r = jnp.float32(ratio)
    keep = lambda f: ((f >= 1.0 - r) | (r <= 0.0)) & (r < 1.0)
    return jax.tree_util.tree_map(
        lambda u, f: u * keep(f).astype(u.dtype), updates, fracs
    )


_OPTIMIZERS: Dict[str, Callable] = {
    "adamw": optax.adamw,
    "adam": lambda lr, weight_decay=0.0, **kw: optax.adam(lr, **kw),
    "radam": lambda lr, weight_decay=0.0, **kw: optax.radam(lr, **kw),
    "sgd": lambda lr, weight_decay=0.0, **kw: optax.sgd(lr, momentum=0.9),
    "lamb": optax.lamb,
    "lion": optax.lion,
    "adafactor": lambda lr, weight_decay=0.0, **kw: optax.adafactor(lr),
}


def _base_opt(name: str, schedule, weight_decay: float) -> optax.GradientTransformation:
    key = (name or "AdamW").lower()
    if key not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name!r}; have {sorted(_OPTIMIZERS)}")
    fn = _OPTIMIZERS[key]
    try:
        return fn(schedule, weight_decay=weight_decay)
    except TypeError:
        return fn(schedule)


def make_clip_optimizer(
    config,
    schedule: optax.Schedule,
    params: PyTree,
) -> optax.GradientTransformation:
    """Optimizer for the contrastive pipeline over the combined param tree
    ``{"video_encoder": ..., "text_encoder": ..., "log_temp": ...,
    "logit_bias": ...}``.

    Groups (reference: projects/contrastive_pretraining_project.py:117-199):
    - video backbone/proj: base lr, video_weight_decay
    - video attention-pool + aggregator: 2x base lr
    - text encoder: text_lr (fixed 2e-5 in reference :137-139), text_weight_decay
    - log_temp / logit_bias: base lr, no weight decay
    """

    def label(path_tuple) -> str:
        parts = [str(getattr(k, "key", k)) for k in path_tuple]
        top = parts[0] if parts else ""
        if top == "text_encoder":
            return "text"
        if top in ("log_temp", "logit_bias"):
            return "scalar"
        joined = "/".join(parts)
        if "aggregator" in joined or ("pool" in joined and "patch" not in joined):
            return "video_2x"
        return "video"

    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: label(p), params
    )

    def scaled(s: float):
        return lambda step: schedule(step) * s

    def with_clip(tx, max_norm):
        if max_norm and max_norm > 0:
            return optax.chain(optax.clip_by_global_norm(max_norm), tx)
        return tx

    video_clip_norm = config.video_max_grad_norm or config.max_grad_norm
    text_clip_norm = config.text_max_grad_norm or config.max_grad_norm

    tx = optax.multi_transform(
        {
            "video": with_clip(
                _base_opt(config.optimizer, schedule, config.video_weight_decay),
                video_clip_norm,
            ),
            "video_2x": with_clip(
                _base_opt(config.optimizer, scaled(2.0), config.video_weight_decay),
                video_clip_norm,
            ),
            "text": with_clip(
                _base_opt(
                    config.optimizer,
                    scaled(config.text_lr / max(config.lr, 1e-12)),
                    config.text_weight_decay,
                ),
                text_clip_norm,
            ),
            "scalar": _base_opt(config.optimizer, schedule, 0.0),
        },
        labels,
    )
    return tx


def global_norm(tree: PyTree) -> jax.Array:
    return optax.global_norm(tree)


def keep_old_if_nonfinite(loss: jax.Array, new: PyTree, old: PyTree) -> PyTree:
    """Select ``old`` leaf-for-leaf when ``loss`` is non-finite (scalar
    broadcast select; XLA fuses it into the optimizer's elementwise update
    chains, so the finite-path cost is nil).

    Train steps pass ``(params, opt_state)`` pairs through this after the
    optimizer update: a blown step then applies NO update at all — params,
    Adam moments, and the optimizer's step counter stay exactly at the last
    finite state (``nan_to_num`` alone is not enough: it maps inf grads to
    3.4e38, which poisons the moments, and Adam's momentum moves params even
    under zeroed grads). The runner's delayed NaN detection (its pipelined
    loop reads metrics two dispatches late) then holds a state whose params
    saw only finite updates, instead of one NaN-poisoned twice over.
    Mirrors the reference's skip-batch NaN sentinel
    (runners/video_constrative_learning_runner.py:740-756) in-program.

    ``DEEPCORO_NANGUARD=0`` (read at trace time) disables the guard and
    returns ``new`` unchanged — chunked quality runs pin it off so their
    compiled program stays byte-identical to the published seeds'
    (dev/quality_run.py; same pattern as DEEPCORO_PACKED_ATTN).
    """
    if os.environ.get("DEEPCORO_NANGUARD", "1") != "1":
        return new
    finite = jnp.isfinite(loss)
    return jax.tree_util.tree_map(lambda n, o: jnp.where(finite, n, o),
                                  new, old)


def optimizer_step_count(opt_state, fallback) -> jax.Array:
    """The schedule-evaluation step: with optax.MultiSteps this is
    ``gradient_step`` (advances once per accumulation window), otherwise the
    caller's micro-step counter."""
    if hasattr(opt_state, "gradient_step"):
        return opt_state.gradient_step
    return fallback


def layerwise_lr_decay_scales(params: PyTree, decay: float = 0.9,
                              layer_pattern: str = r"layer(\d+)|block(\d+)") -> PyTree:
    """BERT-style layerwise LR decay (reference LayerwiseLRDecay,
    utils/optimizer_utils.py:22): leaves in deeper layers get scale
    decay^(max_layer - layer); embeddings get decay^(max_layer+1); non-layer
    leaves (heads, norms outside blocks) get 1.0. Returns a per-leaf scale
    tree to multiply into optimizer updates.
    """
    pat = re.compile(layer_pattern)

    def layer_of(name: str) -> Optional[int]:
        m = pat.search(name)
        if not m:
            return None
        return int(next(g for g in m.groups() if g is not None))

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    layers = []
    for path, _ in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        l = layer_of(name)
        if l is not None:
            layers.append(l)
    max_layer = max(layers) if layers else 0

    def scale(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        l = layer_of(name)
        if l is not None:
            return jnp.float32(decay ** (max_layer - l))
        if "embed" in name.lower():
            return jnp.float32(decay ** (max_layer + 1))
        return jnp.float32(1.0)

    return jax.tree_util.tree_map_with_path(scale, params)


def apply_lr_scales(updates: PyTree, scales: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda u, s: u * s.astype(u.dtype),
                                  updates, scales)


class PhasedTrainingSchedule:
    """Phase-based freeze scheduling (reference PhasedTrainingScheduler,
    utils/optimizer_utils.py:323): maps epoch -> (video_freeze_ratio,
    text_freeze_ratio) through ordered phases [(start_epoch, vfr, tfr), ...].
    """

    def __init__(self, phases):
        self.phases = sorted(phases)

    def at(self, epoch: int):
        vfr, tfr = 0.0, 0.0
        for start, v, t in self.phases:
            if epoch >= start:
                vfr, tfr = v, t
        return vfr, tfr
