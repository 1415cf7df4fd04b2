"""Pipelined train-epoch loop semantics: one-step-delayed metric consumption
must still aggregate every step, and the NaN save-and-raise (reference
runners/video_constrative_learning_runner.py:478-492) must fire."""

import math
from pathlib import Path

import numpy as np
import pytest

from deepcoro_clip_tpu.runners.contrastive import (
    NonFiniteLossError,
    VideoContrastiveLearningRunner,
)


class _Cfg:
    seed = 0
    period = 1
    is_ref_device = True
    siglip_debug_batches = 0
    siglip_debug_every = 1


class _Loader:
    def __init__(self, n):
        self.batches = [
            {"videos": np.zeros((2, 1), np.float32), "texts": ["a", "b"]}
            for _ in range(n)
        ]

    def set_epoch(self, e):
        pass

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


class _Ckpt:
    def __init__(self):
        self.saved = []

    def save_latest(self, state, extra):
        self.saved.append(extra)

    def save_debug(self, name, state, extra):
        # NaN snapshots go under a debug name, never the resumable tree
        self.saved.append(extra)


class _Logger:
    def __init__(self):
        self.rows = []

    def log(self, d, step=0):
        self.rows.append((step, d))


class _State:
    step = 0


class _Bundle:
    batch_sharding_fn = staticmethod(lambda d: d)


def _runner(losses):
    r = object.__new__(VideoContrastiveLearningRunner)
    r.config = _Cfg()
    r.bundle = _Bundle()
    r.loaders = {"train": _Loader(len(losses))}
    r.state = _State()
    r.ckpt = _Ckpt()
    r.logger = _Logger()
    r.multi_positive = False
    it = iter(losses)

    def step(state, batch, rng, vfr, tfr, temp):
        return state, {"loss": np.float32(next(it)), "m": np.float32(1.0)}

    r.train_step = step
    return r


def test_every_step_aggregated():
    r = _runner([2.0, 1.0, 0.5, 0.25])
    out = r._run_train_epoch(0, -1.0, 0.0, 0.0)
    assert out["loss"] == pytest.approx((2.0 + 1.0 + 0.5 + 0.25) / 4)
    assert out["m"] == 1.0
    # periodic logging fired (period*10 cadence -> step 0 in a 4-step epoch)
    assert len(r.logger.rows) == 1
    assert r.logger.rows[0][1]["step/loss"] == 2.0


def test_nan_save_and_raise():
    r = _runner([2.0, float("nan"), 1.0, 1.0])
    with pytest.raises(NonFiniteLossError) as e:
        r._run_train_epoch(3, -1.0, 0.0, 0.0)
    # the failing step index is reported and a checkpoint was saved
    assert "step 1" in str(e.value)
    assert r.ckpt.saved and r.ckpt.saved[0]["nan_loss_at_step"] == 1
    assert r.ckpt.saved[0]["epoch"] == 3


def test_single_batch_epoch():
    r = _runner([1.5])
    out = r._run_train_epoch(0, -1.0, 0.0, 0.0)
    assert out["loss"] == 1.5


def test_empty_epoch():
    r = _runner([])
    assert r._run_train_epoch(0, -1.0, 0.0, 0.0) == {}
