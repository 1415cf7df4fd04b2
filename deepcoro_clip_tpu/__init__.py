"""DeepCORO-CLIP-TPU: a TPU-native (JAX / XLA / Pallas / pjit) video-text foundation
model framework for coronary angiography.

Brand-new implementation with the capabilities of HeartWise-AI/DeepCORO_CLIP
(reference layer map: SURVEY.md §1). The compute path is JAX + Pallas kernels
compiled by XLA onto the TPU MXU; distribution is a single `jax.sharding.Mesh`
with pjit-sharded data/tensor parallelism instead of the reference's
torch DDP + NCCL (reference: utils/ddp.py).
"""

__version__ = "0.1.0"

from deepcoro_clip_tpu.registry import (
    ConfigRegistry,
    LossRegistry,
    ModelRegistry,
    ProjectRegistry,
    RunnerRegistry,
    register_submodules,
)

__all__ = [
    "ConfigRegistry",
    "LossRegistry",
    "ModelRegistry",
    "ProjectRegistry",
    "RunnerRegistry",
    "register_submodules",
    "__version__",
]
