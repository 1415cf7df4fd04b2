"""Test harness: force the CPU backend with 8 virtual devices.

The TPU analogue of the reference's world-size-1 gloo trick
(reference: tests/test_ddp.py:5-60) — but genuinely multi-device: every
sharding/collective test runs on a real 8-way mesh (SURVEY.md §4).
Must run before any jax import.
"""

import os

# Belt (env, honored when jax is not yet imported) ...
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# ... and suspenders (config, honored even when a sitecustomize already
# imported jax and registered a TPU PJRT plugin — as the axon tunnel does).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (trainer loops, e2e compiles)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mesh8():
    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh

    return make_mesh(MeshSpec(data=4, model=2))
