"""CLIP / SigLIP pretraining config.

Field names are kept identical to the reference's ClipConfig
(reference: utils/config/clip_config.py:12-160 and config/clip/*.yaml) so that
reference YAMLs are directly loadable. TPU-specific knobs are additive
(mesh_*, precision, use_pallas_attention).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from deepcoro_clip_tpu.configs.base import BaseConfig
from deepcoro_clip_tpu.registry import ConfigRegistry


@ConfigRegistry.register("DeepCORO_clip", "DeepCORO_clip_simple")
@dataclass
class ClipConfig(BaseConfig):
    # ---- data ----
    data_filename: str = "data/reports.csv"
    root: str = "."
    target_label: Optional[str] = "Report"
    datapoint_loc_label: str = "FileName"
    split_column: str = "Split"
    frames: int = 16
    stride: int = 2
    resize: int = 224
    rand_augment: bool = False
    apply_mask: bool = False
    batch_size: int = 8
    multi_video: bool = False
    num_videos: int = 1
    groupby_column: str = "StudyInstanceUID"
    shuffle_videos: bool = True
    data_mean: Optional[List[float]] = None
    data_std: Optional[List[float]] = None
    dataset_mean: Optional[List[float]] = None
    dataset_std: Optional[List[float]] = None
    max_text_length: int = 512
    # length bucketing: tokenize each batch to the smallest bucket that fits
    # its longest report (the reference always pads to max_text_length; real
    # reports are much shorter, so this cuts text-tower time ~2-3x at the
    # cost of one compiled step per bucket). Empty = always max_text_length.
    text_length_buckets: List[int] = field(default_factory=list)

    # ---- model ----
    model_name: str = "mvit"  # mvit | vit (clean 3D-RoPE ViT) | x3d-ish tiny
    pretrained: bool = False
    aggregate_videos_tokens: bool = True
    per_video_pool: bool = False
    num_heads: int = 8
    aggregator_depth: int = 2
    dropout: float = 0.1
    video_freeze_ratio: float = 0.0
    text_freeze_ratio: float = 0.0
    use_cls_token: bool = False
    pooling_mode: str = "mean"  # per-video token pooling: mean|attention|cls_token
    embedding_dim: int = 512
    text_model_name: str = "pubmedbert"

    # ---- optimization ----
    optimizer: str = "AdamW"
    scheduler_name: str = "cosine"
    lr: float = 1e-4
    text_lr: float = 2e-5  # reference fixes text lr (contrastive project :137-139)
    lr_step_period: int = 20
    factor: float = 0.3
    loss_name: str = "contrastive"
    video_weight_decay: float = 1e-5
    text_weight_decay: float = 1e-7
    gradient_accumulation_steps: int = 1
    num_warmup_percent: float = 0.1
    num_hard_restarts_cycles: float = 1.0
    warm_restart_tmult: int = 2
    max_grad_norm: float = 1.0
    video_max_grad_norm: Optional[float] = None
    text_max_grad_norm: Optional[float] = None
    temperature: float = 0.07
    label_smoothing: float = 0.0
    # temperature / freeze schedules (reference: runner :147-255)
    temp_schedule: str = "learnable"  # learnable|constant|linear|cosine|exponential
    temp_start: Optional[float] = None
    temp_end: Optional[float] = None
    video_freeze_schedule: Optional[str] = None
    text_freeze_schedule: Optional[str] = None

    # ---- checkpoint policy ----
    save_best: str = "loss"  # loss | alignment

    # ---- metrics ----
    recall_k: List[int] = field(default_factory=lambda: [1, 5, 10, 50])
    ndcg_k: List[int] = field(default_factory=lambda: [5])

    # ---- SigLIP multi-positive (reference: config/clip/siglip_*.yaml) ----
    siglip_texts_path: Optional[str] = None
    siglip_edges_path: Optional[str] = None
    siglip_max_positive_per_video: int = 8
    siglip_negatives_per_video: int = 0
    siglip_round_robin_sampling: bool = True
    siglip_max_segments_per_video: int = 15
    siglip_positive_severity_weights: Optional[Dict[str, float]] = None
    siglip_enable_severity_weighting: bool = False
    siglip_positive_loss_weight: float = 1.0
    siglip_negative_loss_weight: float = 1.0
    siglip_use_class_aware_sampler: bool = False
    # contradiction weighting (reference single_head_sampler.py:138-158):
    # NORMAL texts for segments with >= min-severity positives are boosted
    # as hard negatives
    siglip_contradiction_boost: float = 0.0
    siglip_contradiction_min_severity: str = "moderate"
    # batch-level sampler policy: "pairs" = per-item positive/negative packs
    # (SiglipVideoDataset), "single_head" = the reference's full
    # SingleHeadRetrievalSampler batch assembly (severity-capped positives,
    # bucketed negative quotas, class-balance weights;
    # data/single_head_sampler.py)
    siglip_sampler: str = "pairs"
    siglip_base_negative_weight: float = 0.04
    siglip_min_pos_weight: float = 0.0
    siglip_abnormal_ratio: float = 0.5
    siglip_use_weighted_loss: bool = False
    siglip_bias_init: float = -10.0
    siglip_entropy_reg_weight: float = 0.0
    siglip_auto_balance: bool = False
    siglip_logit_clamp: float = 30.0
    # per-sample logit/grad debug dumps (reference siglip_debug_batches/
    # every/sample_count gates, runners/video_constrative_learning_runner.py
    # :124-131,1337-1383; utils/siglip_logging.py:106-484). 0 batches = off.
    siglip_debug_batches: int = 0
    siglip_debug_every: int = 1
    siglip_debug_sample_count: int = 4

    # ---- LocCa report-generation head (reference:
    # config/clip/siglip2_config.yaml:62-66) ----
    locca_enabled: bool = False
    locca_weight: float = 0.5  # LocCa loss weight relative to the main loss
    locca_num_layers: int = 4
    locca_d_model: int = 512  # must match video-encoder output dim
    locca_num_heads: int = 8
    locca_max_seq_len: int = 256
    # weights of the three LocCa tasks inside the combined loss
    locca_task_weights: Optional[Dict[str, float]] = None

    # ---- inference ----
    topk: int = 5
    text_embeddings_path: Optional[str] = None
    metadata_path: Optional[str] = None
    inference_results_path: str = "outputs/inference"

    # ---- early stopping ----
    early_stopping_patience: Optional[int] = None

    # ---- TPU-native additions ----
    precision: str = "bf16"  # bf16 | fp32 compute (params always fp32)
    use_pallas_attention: bool = True  # Pallas flash-attn on TPU backend
    # sequence parallelism: ring attention over the token axis in the video
    # backbone (parallel/ring_attention.py; active when the token count is
    # divisible by the ring-axis size)
    use_ring_attention: bool = False
    ring_axis: str = "model"
    # video transformer architecture (used when model_name in {"mvit","vit"})
    # head_dim 128 = one full MXU/VPU lane tile per head
    vit_dim: int = 512
    vit_depth: int = 12
    vit_heads: int = 4
    vit_patch: List[int] = field(default_factory=lambda: [2, 16, 16])
    vit_pool_stages: List[int] = field(default_factory=list)  # block idxs that pool 2x2 spatial
    rope_temporal_scale: float = 1.0
    text_vocab_size: int = 30522
    text_dim: int = 768
    text_depth: int = 12
    text_heads: int = 12
