"""String-keyed component registries.

The reference framework's backbone is a set of name->class registries populated by
decorators at import time (reference: utils/registry.py:13-94); the YAML key
``pipeline_project`` selects config/project/runner classes by the same string
(reference: scripts/main.py:26-30). We keep that public contract: the same
pipeline names resolve to the TPU-native implementations.
"""

from __future__ import annotations

import importlib
import pkgutil
from enum import Enum
from typing import Any, Callable, Dict, Type


class RegistryError(KeyError):
    """Raised when a name is missing from a registry."""


class BaseRegistry:
    """A name -> class map with a decorator-based ``register``.

    Subclasses each get their own independent ``_registry`` dict (created lazily
    per subclass so registries never share state).
    """

    _registry: Dict[str, Type] = {}

    @classmethod
    def _own_registry(cls) -> Dict[str, Type]:
        if "_registry" not in cls.__dict__:
            cls._registry = {}
        return cls._registry

    @classmethod
    def register(cls, *names: str) -> Callable[[Type], Type]:
        """Decorator: register a class under one or more string keys."""

        def deco(klass: Type) -> Type:
            reg = cls._own_registry()
            for name in names:
                key = name.value if isinstance(name, Enum) else str(name)
                reg[key] = klass
            return klass

        return deco

    @classmethod
    def get(cls, name: str) -> Type:
        key = name.value if isinstance(name, Enum) else str(name)
        reg = cls._own_registry()
        if key not in reg:
            known = ", ".join(sorted(reg)) or "<empty>"
            raise RegistryError(
                f"{cls.__name__}: unknown key {key!r}. Registered: {known}"
            )
        return reg[key]

    @classmethod
    def create(cls, name: str, **kwargs: Any) -> Any:
        return cls.get(name)(**kwargs)

    @classmethod
    def names(cls) -> list[str]:
        return sorted(cls._own_registry())

    @classmethod
    def contains(cls, name: str) -> bool:
        return str(name) in cls._own_registry()


class ModelRegistry(BaseRegistry):
    """Models: video_encoder, text_encoder, multi_instance_linear_probing, ..."""


class RunnerRegistry(BaseRegistry):
    """Runners keyed by pipeline_project."""


class ProjectRegistry(BaseRegistry):
    """Projects keyed by pipeline_project."""


class ConfigRegistry(BaseRegistry):
    """Config dataclasses keyed by pipeline_project."""


class LossRegistry(BaseRegistry):
    """Loss callables keyed by loss_name (case-normalised at lookup)."""

    @classmethod
    def get(cls, name: str) -> Type:
        # Reference accepts both enum-style upper keys ("INFONCE_LOSS_DDP") and
        # lower ("contrastive"); normalise to lower-case.
        return super().get(str(name).lower())

    @classmethod
    def register(cls, *names: str):
        return super().register(*[str(n).lower() for n in names])


class SubmoduleType(str, Enum):
    MODEL = "models"
    LOSS = "losses"
    RUNNER = "runners"
    PROJECT = "projects"
    CONFIG = "configs"


_REGISTERED: set[str] = set()


def register_submodules(*types: SubmoduleType) -> None:
    """Import every module under the given subpackages so decorators run.

    Mirrors the reference's recursive submodule import
    (reference: utils/registry.py:82-94).
    """
    for t in types:
        pkg_name = f"deepcoro_clip_tpu.{t.value}"
        if pkg_name in _REGISTERED:
            continue
        pkg = importlib.import_module(pkg_name)
        for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg_name + "."):
            importlib.import_module(info.name)
        _REGISTERED.add(pkg_name)


def register_all() -> None:
    register_submodules(
        SubmoduleType.CONFIG,
        SubmoduleType.MODEL,
        SubmoduleType.LOSS,
        SubmoduleType.RUNNER,
        SubmoduleType.PROJECT,
    )
