"""SiglipRuntimeSettings resolver vs the reference's
utils/siglip/runtime_settings.py:70-199 (orphaned there — no importer in the
reference tree — but its defaults/clamps/ladders are the documented contract
for the siglip_* knob namespace)."""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from deepcoro_clip_tpu.data.siglip_runtime import SiglipRuntimeSettings

# every scalar field the reference resolver returns (dataclass-level)
SCALARS = [
    "eps", "abnormal_margin", "negative_weight", "infonce_weight",
    "focal_infonce", "focal_gamma_pos", "focal_gamma_neg",
    "focal_alpha_default", "focal_alpha_clip_min", "focal_alpha_clip_max",
    "focal_detach_weights", "hard_neg_topk", "hard_neg_boost",
    "use_weighted_loss", "use_logit_bias_train", "logit_bias_scale_train",
    "phase_default", "phase_transition_epoch",
]
DEBUG_FIELDS = ["batches_per_epoch", "every", "sample_count", "sync",
                "barrier_debug"]
BAG_FIELDS = ["lambda_start", "lambda_end", "start_epoch", "warmup_epochs",
              "reduce", "topk", "loss_type", "huber_delta", "targets_sum",
              "targets_mean", "lambda_by_severity"]
RETRIEVAL_FIELDS = ["fp16", "use_logit_bias_eval", "logit_bias_scale_eval",
                    "use_textbank_cache", "textbank_cache_dir"]


def _ref_settings(reference, cfg, output_dir):
    from utils.siglip.runtime_settings import (  # noqa: PLC0415
        SiglipRuntimeSettings as RefSettings,
    )

    return RefSettings.from_config(cfg, output_dir)


def _assert_match(ours, ref):
    for f in SCALARS:
        assert getattr(ours, f) == getattr(ref, f), f
    for f in DEBUG_FIELDS:
        assert getattr(ours.debug, f) == getattr(ref.debug, f), f"debug.{f}"
    for f in BAG_FIELDS:
        assert getattr(ours.bag, f) == getattr(ref.bag, f), f"bag.{f}"
    for f in RETRIEVAL_FIELDS:
        assert getattr(ours.retrieval, f) == getattr(ref.retrieval, f), (
            f"retrieval.{f}")


def test_defaults_match(reference):
    cfg = SimpleNamespace()
    _assert_match(SiglipRuntimeSettings.from_config(cfg, "/tmp/out"),
                  _ref_settings(reference, cfg, "/tmp/out"))


def test_overrides_and_clamps_match(reference):
    cfg = SimpleNamespace(
        siglip_loss_eps=1e-5,
        siglip_abnormal_margin=0.2,
        siglip_negative_weight=1.5,
        siglip_infonce_weight=0.9,        # reference clamps to min(., 0.5)
        siglip_focal_infonce=False,
        siglip_focal_gamma_pos=1.0,
        siglip_focal_alpha_clip_min=4.0,  # max(2.0) < min → max snaps to min
        siglip_focal_alpha_clip_max=2.0,
        siglip_hard_neg_topk=5,
        siglip_hard_neg_boost=0.3,
        siglip_use_weighted_loss=True,
        use_logit_bias_train=True,
        logit_bias_scale_train=0.7,
        siglip_phase_default="b",          # upper-cased by both
        siglip_phase_transition_epoch=3,
        siglip_debug_batch_per_epoch=2,    # reference spelling
        siglip_debug_every=2,
        siglip_debug_sample_count=6,
        siglip_debug_sync=True,
        siglip_barrier_debug=True,
        siglip_bag_lambda=0.01,            # legacy alias feeds lambda_end
        siglip_bag_start_epoch=1,
        siglip_bag_reduce="MEAN",          # lower-cased by both
        siglip_bag_topk=0,                 # max(1, .) by both
        siglip_bag_loss_type="Huber",
        siglip_bag_huber_delta=0.5,
        # ladder overlays: key normalization + unparseable values skipped
        siglip_bag_targets={" Severe ": 1.9, "cto": "bad-value"},
        siglip_bag_targets_mean={"NORMAL": 0.05},
        siglip_bag_lambda_by_severity={"mild": 0.002, "unknown": 0.5},
        retrieval_fp16=True,
        use_logit_bias_eval=True,
        logit_bias_scale_eval=0.4,
        use_textbank_cache=False,
        textbank_cache_dir="/tmp/tbc",
    )
    ours = SiglipRuntimeSettings.from_config(cfg, "/tmp/out")
    ref = _ref_settings(reference, cfg, "/tmp/out")
    _assert_match(ours, ref)
    assert ours.infonce_weight == 0.5
    assert ours.focal_alpha_clip_max == 4.0
    assert ours.bag.targets_sum["severe"] == 1.9
    assert ours.bag.targets_sum["cto"] == 2.0  # unparseable → default kept


def test_output_dir_default_cache_dir(reference):
    cfg = SimpleNamespace()
    ours = SiglipRuntimeSettings.from_config(cfg, None)
    ref = _ref_settings(reference, cfg, None)
    assert ours.retrieval.textbank_cache_dir == ref.retrieval.textbank_cache_dir


@pytest.mark.parametrize("default,transition,expect", [
    ("A", None, ["A", "A", "A", "A"]),
    ("A", 2, ["A", "A", "B", "B"]),
    ("B", 1, ["B", "A", "A", "A"]),
])
def test_phase_for_epoch(default, transition, expect):
    rt = SiglipRuntimeSettings.from_config(
        SimpleNamespace(siglip_phase_default=default,
                        siglip_phase_transition_epoch=transition))
    assert [rt.phase_for_epoch(e) for e in range(4)] == expect
