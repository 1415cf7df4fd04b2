"""Config system: YAML -> dataclass -> CLI overrides.

Mirrors the reference's three-stage config flow (reference:
utils/config/heartwise_config.py:10-95 — ``from_yaml``, CLI-override merge,
device info injection), with field names kept IDENTICAL to the reference YAMLs
so configs are portable (SURVEY.md §7 "Checkpoint import").

Device info comes from JAX (process index/count, local device count) instead of
torchrun env vars (reference: heartwise_config.py:85-95).
"""

from __future__ import annotations

import dataclasses
import typing
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


def _coerce(value: Any, ftype: Any) -> Any:
    """Best-effort coercion of YAML/CLI values to the dataclass field type."""
    origin = typing.get_origin(ftype)
    if value is None:
        return None
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(ftype) if a is not type(None)]
        if len(args) == 1:
            return _coerce(value, args[0])
        return value
    if origin in (list, typing.List):
        (inner,) = typing.get_args(ftype) or (str,)
        if isinstance(value, str):
            value = [v for v in value.strip("[]").split(",") if v != ""]
        return [_coerce(v, inner) for v in value]
    if origin in (dict, typing.Dict):
        return dict(value)
    if ftype is bool:
        if isinstance(value, bool):
            return value
        return str(value).lower() in ("1", "true", "t", "yes", "y")
    if ftype in (int, float, str):
        return ftype(value)
    return value


@dataclass
class BaseConfig:
    """Common fields shared by every pipeline (reference: HeartWiseConfig)."""

    pipeline_project: str = "DeepCORO_clip"
    run_mode: str = "train"  # train | val | test | inference
    seed: int = 42
    epochs: int = 10
    num_workers: int = 2
    # "thread" (C++ decode releases the GIL) or "process" (spawned workers
    # for many-core hosts where Python-side sample assembly bottlenecks)
    loader_backend: str = "thread"
    debug: bool = False
    period: int = 1
    # per-backbone-block gradient-norm metrics inside the jitted step
    # (reference log_gradient_norms, utils/wandb_logger.py:491-510).
    # ~20 extra tree-wide reductions per step (~5% step time) — off by
    # default; per-tower norms are always logged.
    log_layer_grad_norms: bool = False
    use_amp: bool = True  # on TPU: bf16 compute (no GradScaler needed)
    output_dir: str = "outputs"
    base_checkpoint_path: str = "outputs"
    checkpoint: Optional[str] = None
    resume_training: bool = False
    # params-only warm start from another run's checkpoint (optimizer/step
    # state stay fresh — unlike resume_training). The reference's pretrained
    # initialization role (checkpoint loading into towers before training).
    init_from_checkpoint: Optional[str] = None

    # wandb-compatible experiment identity (logging backend is pluggable)
    name: str = "deepcoro_clip_tpu"
    project: str = "deepcoro_clip_tpu"
    entity: str = ""
    tag: str = ""
    use_wandb: bool = False

    # Mesh layout (TPU-native; new capability vs reference's pure DDP)
    mesh_data: int = -1  # -1 = all devices / mesh_model
    mesh_model: int = 1

    # H2D wire format (TPU-native): "uint8" ships raw pixels at 1/4 the
    # bytes and normalizes on-device (fused by XLA); "float32" normalizes on
    # the host (use for pre-scaled float sources outside [0, 255]).
    wire_dtype: str = "uint8"
    # Patch-major uint8 wire: the host does the patchify space-to-depth
    # (native/fastvideo.cpp, data/patch_wire.py) so the device patchify is a
    # pure MXU matmul — removes XLA's strided uint8 operand copy (~5.5 ms,
    # 5.8% of the flagship step; dev/profile_step.py r3). uint8-wire only.
    patch_wire: bool = False
    # Grayscale wire (uint8 wire only): ship ONE channel and fold the
    # replication into the patchify weights on-device (exact for
    # grayscale-replicated sources — the reference loads DICOM luma to RGB).
    # 1/3 the H2D bytes and host preprocessing; checkpoints stay 3-channel
    # and interchangeable with the RGB wire (models/layers._PatchProj).
    mono_wire: bool = False

    # Filled in by set_device_info_in_place (never from YAML)
    is_ref_device: bool = True
    process_index: int = 0
    process_count: int = 1
    world_size: int = 1  # number of devices on the data axis

    # ------------------------------------------------------------------ #

    @classmethod
    def _type_hints(cls) -> Dict[str, Any]:
        # f.type is a string under `from __future__ import annotations`;
        # resolve real types once per class.
        if "_resolved_hints" not in cls.__dict__:
            cls._resolved_hints = typing.get_type_hints(cls)
        return cls._resolved_hints

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BaseConfig":
        hints = cls._type_hints()
        known = {f.name for f in fields(cls)}
        kwargs = {}
        extra = {}
        for k, v in d.items():
            if k in known:
                kwargs[k] = _coerce(v, hints[k])
            else:
                extra[k] = v
        obj = cls(**kwargs)
        # Keep unknown YAML keys accessible (reference scatters getattr(config,
        # key, default) at use sites, SURVEY.md §5.6).
        object.__setattr__(obj, "_extra", extra)
        return obj

    @classmethod
    def from_yaml(cls, path: str | Path) -> "BaseConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    def update_with_args(self, overrides: Dict[str, Any]) -> "BaseConfig":
        """Apply CLI overrides in place (reference:
        heartwise_config.py:33-49)."""
        hints = type(self)._type_hints()
        known = {f.name for f in fields(self)}
        for k, v in overrides.items():
            if v is None:
                continue
            if k in known:
                setattr(self, k, _coerce(v, hints[k]))
            else:
                self.extra()[k] = v
        return self

    def extra(self) -> Dict[str, Any]:
        if not hasattr(self, "_extra"):
            object.__setattr__(self, "_extra", {})
        return self._extra

    def get(self, key: str, default: Any = None) -> Any:
        if hasattr(self, key):
            return getattr(self, key)
        return self.extra().get(key, default)

    def set_device_info_in_place(self) -> None:
        import jax

        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_ref_device = self.process_index == 0
        model = max(1, self.mesh_model)
        self.world_size = max(1, jax.device_count() // model)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d.update(self.extra())
        return d

    def save_yaml(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=True)
