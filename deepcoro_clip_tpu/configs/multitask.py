"""Multitask (contrastive + captioning + masked video modeling) config.

Field parity with reference: utils/config/multitask_config.py:10-.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from deepcoro_clip_tpu.configs.clip import ClipConfig
from deepcoro_clip_tpu.registry import ConfigRegistry


@ConfigRegistry.register("DeepCORO_multitask")
@dataclass
class MultitaskConfig(ClipConfig):
    # task loss weights (reference: utils/loss/multitask_loss.py:17-)
    loss_weights: Dict[str, float] = field(
        default_factory=lambda: {"contrastive": 1.0, "captioning": 1.0, "mvm": 1.0}
    )
    loss_weight_schedule: Optional[Dict[str, List[float]]] = None

    # captioning decoder (reference: models/captioning_decoder.py)
    captioning_lr: float = 1e-4
    decoder_dim: int = 512
    decoder_depth: int = 4
    decoder_heads: int = 8
    decoder_max_length: int = 128
    caption_label_smoothing: float = 0.1

    # masked video modeling (reference: models/masked_video_modeling.py)
    mvm_lr: float = 1e-4
    mask_ratio: float = 0.75
    mvm_decoder_dim: int = 256
    mvm_decoder_depth: int = 2
    mvm_norm_targets: bool = True

    # multi-view consistency (reference: runners/multitask_runner.py:897-913)
    consistency_weight: float = 0.0

    # scheduled sampling for caption training (beyond-reference; two-pass
    # parallel variant — Bengio et al. 2015 via Mihaylova & Martins 2019's
    # transformer adaptation): with probability p, decoder inputs at t>0 are
    # the model's own pass-1 predictions instead of gold tokens. p ramps
    # linearly from 0 over ``scheduled_sampling_warmup_steps``. 0.0 = off
    # (program unchanged; enabling doubles decoder fwd FLOPs).
    scheduled_sampling_prob: float = 0.0
    scheduled_sampling_warmup_steps: int = 0
