"""CLI parser: ``--base_config config.yaml`` + per-field overrides.

Mirrors the reference's HeartWiseParser flow (reference: utils/parser.py:15-457):
YAML selects the config class via ``pipeline_project``; every dataclass field
becomes an optional CLI override. Unlike the reference (hand-written argparse
groups per pipeline), overrides are auto-generated from the dataclass, so new
fields are immediately overridable.
"""

from __future__ import annotations

import argparse
import typing
from dataclasses import MISSING, fields
from typing import Any, Dict, List, Optional, Sequence

import yaml

from deepcoro_clip_tpu.configs.base import BaseConfig
from deepcoro_clip_tpu.registry import ConfigRegistry


def _cli_type(ftype: Any):
    origin = typing.get_origin(ftype)
    if origin is typing.Union:
        args = [a for a in typing.get_args(ftype) if a is not type(None)]
        if len(args) == 1:
            return _cli_type(args[0])
        return str
    if origin in (list, dict):
        return str  # parsed by _coerce later (comma list / yaml dict)
    if ftype is bool:
        return str  # accepts true/false; coerced downstream
    if ftype in (int, float, str):
        return ftype
    return str


def parse_config(argv: Optional[Sequence[str]] = None) -> BaseConfig:
    """Parse ``--base_config`` + overrides into the pipeline's config class."""
    boot = argparse.ArgumentParser(add_help=False)
    boot.add_argument("--base_config", "--config", dest="base_config", required=True)
    known, rest = boot.parse_known_args(argv)

    with open(known.base_config) as f:
        raw = yaml.safe_load(f) or {}
    pipeline = raw.get("pipeline_project", "DeepCORO_clip")
    cfg_cls = ConfigRegistry.get(pipeline)

    parser = argparse.ArgumentParser(
        prog="deepcoro_clip_tpu", parents=[boot], description=f"pipeline={pipeline}"
    )
    for f in fields(cfg_cls):
        if f.name.startswith("_"):
            continue
        hints = cfg_cls._type_hints()
        parser.add_argument(
            f"--{f.name}", type=_cli_type(hints[f.name]), default=None
        )
    ns = parser.parse_args(argv)

    config = cfg_cls.from_dict(raw)
    overrides = {
        k: v for k, v in vars(ns).items() if k != "base_config" and v is not None
    }
    # dict-typed overrides arrive as YAML strings
    for k, v in list(overrides.items()):
        hint = cfg_cls._type_hints().get(k)
        if typing.get_origin(hint) in (dict, typing.Dict) and isinstance(v, str):
            overrides[k] = yaml.safe_load(v)
    config.update_with_args(overrides)
    config.set_device_info_in_place()
    return config
