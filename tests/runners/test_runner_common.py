"""Direct tests for the shared runner plumbing (runners/common.py).

The three runners used to carry drifting copies of mesh sizing and
dataset-stats resolution; these pin the unified semantics.
"""

import math

import pytest

from deepcoro_clip_tpu.configs.clip import ClipConfig
from deepcoro_clip_tpu.runners.common import (
    make_runner_mesh,
    resolve_dataset_stats,
)


def _cfg(**over):
    d = dict(pipeline_project="DeepCORO_clip", run_mode="train",
             data_filename="unused.csv", batch_size=6)
    d.update(over)
    return ClipConfig.from_dict(d)


def test_mesh_data_axis_shrinks_to_gcd_of_batch(mesh8):
    # 8 devices but batch 6: data axis must divide the global batch
    cfg = _cfg(batch_size=6, mesh_data=0, mesh_model=1)
    m = make_runner_mesh(cfg)
    assert m.shape["data"] == math.gcd(8, 6)
    assert m.shape["model"] == 1


def test_mesh_model_axis_reserved_first(mesh8):
    cfg = _cfg(batch_size=8, mesh_data=0, mesh_model=2)
    m = make_runner_mesh(cfg)
    assert m.shape["model"] == 2
    assert m.shape["data"] == 4  # 8 devices / model 2, gcd with batch 8


class _FakeDataset:
    mean = None
    std = None


def test_stats_config_override_wins_and_writes_back():
    cfg = _cfg(dataset_mean=[1.0, 2.0, 3.0], dataset_std=[4.0, 5.0, 6.0])
    mean, std = resolve_dataset_stats(cfg, {"train": _FakeDataset()})
    assert mean == [1.0, 2.0, 3.0] and std == [4.0, 5.0, 6.0]
    assert cfg.dataset_mean == mean and cfg.dataset_std == std


def test_stats_legacy_data_mean_fallback():
    # the probing runner's pre-unification copy silently lacked this
    cfg = _cfg(data_mean=[7.0, 7.0, 7.0], data_std=[2.0, 2.0, 2.0])
    mean, std = resolve_dataset_stats(cfg, {"train": None})
    assert mean == [7.0, 7.0, 7.0] and std == [2.0, 2.0, 2.0]


def test_stats_required_outside_training():
    cfg = _cfg(run_mode="val")
    with pytest.raises(ValueError, match="dataset_mean"):
        resolve_dataset_stats(cfg, {"train": None})


def test_stats_pushed_to_datasets_on_float_wire():
    cfg = _cfg(wire_dtype="float32",
               dataset_mean=[0.5, 0.5, 0.5], dataset_std=[0.1, 0.1, 0.1])
    ds = _FakeDataset()
    resolve_dataset_stats(cfg, {"train": ds, "val": None})
    assert ds.mean == [0.5, 0.5, 0.5] and ds.std == [0.1, 0.1, 0.1]


def test_stats_not_pushed_on_uint8_wire():
    # uint8 wire: normalization is folded into patchify weights on-device;
    # host datasets must NOT normalize
    cfg = _cfg(wire_dtype="uint8",
               dataset_mean=[0.5] * 3, dataset_std=[0.1] * 3)
    ds = _FakeDataset()
    resolve_dataset_stats(cfg, {"train": ds})
    assert ds.mean is None and ds.std is None
