"""Linear-probing / multi-instance-learning config.

Field parity with reference: utils/config/linear_probing_config.py:13-111 and
config/linear_probing/**/*.yaml (head_structure / loss_structure / head_task /
head_lr dicts; MIL pooling + view-embedding + bootstrap-CI knobs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from deepcoro_clip_tpu.configs.base import BaseConfig
from deepcoro_clip_tpu.registry import ConfigRegistry


@ConfigRegistry.register("DeepCORO_video_linear_probing")
@dataclass
class LinearProbingConfig(BaseConfig):
    # ---- data ----
    data_filename: str = "data/labels.csv"
    root: str = "."
    datapoint_loc_label: str = "FileName"
    split_column: str = "Split"
    frames: int = 16
    stride: int = 2
    resize: int = 224
    rand_augment: bool = False
    batch_size: int = 8
    multi_video: bool = True
    num_videos: int = 4
    groupby_column: str = "StudyInstanceUID"
    shuffle_videos: bool = True
    dataset_mean: Optional[List[float]] = None
    dataset_std: Optional[List[float]] = None

    # ---- heads ----
    # {"head_name": {"label_col": n_classes}} e.g. {"stenosis": {"stenosis_pct": 1}}
    head_structure: Dict[str, int] = field(default_factory=dict)
    loss_structure: Dict[str, str] = field(default_factory=dict)  # head -> loss name
    head_task: Dict[str, str] = field(default_factory=dict)  # head -> regression|binary|multiclass
    head_lr: Dict[str, float] = field(default_factory=dict)
    head_weight_decay: Dict[str, float] = field(default_factory=dict)
    head_weights: Dict[str, float] = field(default_factory=dict)
    head_dropout: Dict[str, float] = field(default_factory=dict)
    labels_map: Dict[str, Dict[str, int]] = field(default_factory=dict)
    target_labels: List[str] = field(default_factory=list)

    # ---- MIL pooling (reference: models/multi_instance_linear_probing.py) ----
    pooling_mode: str = "attention"  # mean|max|attention|cls_token|mean+cls_token|attention+cls_token
    attention_hidden: int = 256
    dropout_attention: float = 0.0
    use_cls_token: bool = False
    normalization_strategy: str = "post_norm"  # pre_norm | post_norm
    separate_video_attention: bool = True
    attention_lr: Optional[float] = None
    attention_weight_decay: Optional[float] = None
    attention_within_lr: Optional[float] = None
    attention_across_lr: Optional[float] = None
    attention_within_weight_decay: Optional[float] = None
    attention_across_weight_decay: Optional[float] = None

    # view-aware MIL (EchoJEPA-style view embeddings, reference :141-145)
    use_view_embeddings: bool = False
    view_column: Optional[str] = None
    num_view_classes: int = 0
    view_embedding_lr: Optional[float] = None
    # view name -> class id (reference view_aware configs' view_labels_map)
    view_labels_map: Dict[str, int] = field(default_factory=dict)

    # ---- encoder ----
    model_name: str = "mvit"
    aggregate_videos_tokens: bool = False  # forced false (reference :342-354)
    per_video_pool: bool = False
    video_encoder_checkpoint_path: Optional[str] = None
    video_freeze_ratio: float = 1.0
    dropout: float = 0.1
    num_heads: int = 8
    aggregator_depth: int = 2
    embedding_dim: int = 512
    hierarchical_tokens: bool = False  # [B,N,L,D] two-level pooling

    # ---- optimization ----
    optimizer: str = "AdamW"
    scheduler_name: str = "cosine"
    lr: float = 1e-3
    lr_step_period: int = 4
    factor: float = 0.3
    weight_decay: float = 1e-5
    gradient_accumulation_steps: int = 1
    num_warmup_percent: float = 0.1
    num_hard_restarts_cycles: float = 1.0
    warm_restart_tmult: int = 2
    max_grad_norm: float = 1.0

    # ---- eval ----
    ci_confidence_level: float = 0.95
    ci_n_bootstrap: int = 1000
    save_best: str = "loss"
    early_stopping_patience: Optional[int] = None

    # ---- inference ----
    inference_model_path: Optional[str] = None
    save_embeddings: bool = False
    # Split-column value to load in non-train modes (reference
    # PCI_comparison configs: `split_filter: diagnostic` selects pre-PCI
    # rows, `POST_PCI` the post-PCI rows, out of one manifest). None keeps
    # the run_mode-named split; "all" disables filtering.
    split_filter: Optional[str] = None
    # Basename for the saved study-embedding archive (reference
    # `embedding_output_file`); default study_embeddings.npz
    embedding_output_file: Optional[str] = None

    # ---- TPU-native additions ----
    precision: str = "bf16"
    use_pallas_attention: bool = True
    vit_dim: int = 512
    vit_depth: int = 12
    vit_heads: int = 4
    vit_patch: List[int] = field(default_factory=lambda: [2, 16, 16])
    vit_pool_stages: List[int] = field(default_factory=list)


@ConfigRegistry.register("DeepCORO_Multiview", "DeepCORO_Multiview_test")
@dataclass
class MultiviewConfig(LinearProbingConfig):
    """Legacy multiview config (reference: utils/config/multiview_config.py
    :11-55, registered but used by no project in the reference either).
    An alias of the linear-probing pipeline with the legacy field names, so
    old DeepCORO_Multiview YAMLs still parse and dispatch."""

    task: str = "classification"
    linear_probing_head: str = "linear"
    # legacy knob: single encoder lr (maps onto the probing lr)
    video_encoder_lr: Optional[float] = None

    def __post_init__(self):
        if self.video_encoder_lr is not None:
            self.lr = float(self.video_encoder_lr)
        # the legacy pipeline dispatches to the linear-probing project
        if self.pipeline_project.startswith("DeepCORO_Multiview"):
            object.__setattr__(self, "pipeline_project",
                               "DeepCORO_video_linear_probing")
