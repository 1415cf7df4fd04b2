"""Reference-parity harness setup (VERDICT round-2, next-step #1).

torch + transformers are installed in this environment, so these tests
import the ACTUAL reference implementations from /root/reference (read-only
import for testing — no code is copied) and assert numerical agreement with
this repo's JAX/numpy implementations on shared random inputs.

Heavy reference deps that are absent here (wandb, torchvision) are stubbed
with empty modules — both are used only at call time on paths these tests
never execute.
"""

from __future__ import annotations

import sys
import types

import pytest

REFERENCE = "/root/reference"


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec(name) works (transformers
    # probes torchvision availability that way)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="session")
def reference():
    """sys.path hook exposing /root/reference as importable packages."""
    _stub("wandb", init=lambda *a, **k: None, log=lambda *a, **k: None,
          run=None)
    tv = _stub("torchvision")
    models = _stub("torchvision.models")
    video = _stub("torchvision.models.video",
                  mvit_v2_s=lambda *a, **k: None,
                  r3d_18=lambda *a, **k: None)
    transforms = _stub("torchvision.transforms")
    tv.models = models
    models.video = video
    tv.transforms = transforms
    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)  # append: repo packages keep priority
    yield REFERENCE
