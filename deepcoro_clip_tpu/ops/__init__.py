from deepcoro_clip_tpu.ops.rope3d import Rope3DTables, build_rope3d_tables
from deepcoro_clip_tpu.ops.attention import multi_head_attention

__all__ = ["Rope3DTables", "build_rope3d_tables", "multi_head_attention"]
