from deepcoro_clip_tpu.configs.base import BaseConfig
from deepcoro_clip_tpu.configs.clip import ClipConfig
from deepcoro_clip_tpu.configs.linear_probing import LinearProbingConfig, MultiviewConfig
from deepcoro_clip_tpu.configs.multitask import MultitaskConfig

__all__ = ["BaseConfig", "ClipConfig", "LinearProbingConfig", "MultitaskConfig"]
