"""LR schedule tests (reference: tests/utils/test_schedulers.py)."""

import numpy as np
import pytest

from deepcoro_clip_tpu.train.run_schedules import freeze_ratio_at, temperature_at
from deepcoro_clip_tpu.train.schedulers import get_scheduler


def test_cosine_decays_to_zero():
    s = get_scheduler("cosine", 1.0, steps_per_epoch=10, epochs=10)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(99)) < 0.01


def test_step_decay_per_epoch():
    s = get_scheduler("step", 1.0, steps_per_epoch=10, epochs=100,
                      factor=0.5, lr_step_period=2)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(19)) == pytest.approx(1.0)   # epoch 1 (< period)
    assert float(s(20)) == pytest.approx(0.5)   # epoch 2
    assert float(s(45)) == pytest.approx(0.25)  # epoch 4


def test_warmup_then_cosine():
    s = get_scheduler("cosine_with_warmup", 1.0, steps_per_epoch=10, epochs=10,
                      num_warmup_percent=0.1)
    assert float(s(0)) == pytest.approx(0.0, abs=1e-6)
    assert float(s(10)) == pytest.approx(1.0, rel=1e-3)  # peak after warmup
    assert float(s(99)) < 0.01


def test_linear_warmup_then_linear_decay():
    # HF get_linear_schedule_with_warmup shape (reference
    # utils/schedulers.py:76-84): up to lr over warmup, then down to 0
    s = get_scheduler("linear_warmup", 2.0, steps_per_epoch=10, epochs=10,
                      num_warmup_percent=0.1)
    assert float(s(5)) == pytest.approx(1.0, rel=1e-6)
    assert float(s(10)) == pytest.approx(2.0)
    assert float(s(55)) == pytest.approx(1.0)   # halfway down
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)


def test_hard_restarts_cycle():
    s = get_scheduler("cosine_with_hard_restarts_with_warmup", 1.0,
                      steps_per_epoch=10, epochs=10,
                      num_warmup_percent=0.1, num_hard_restarts_cycles=3)
    vals = [float(s(i)) for i in range(100)]
    # after warmup the schedule restarts (value jumps back up) at least twice
    jumps = sum(1 for a, b in zip(vals[10:], vals[11:]) if b > a + 0.5)
    assert jumps >= 2


def test_unknown_scheduler_raises():
    with pytest.raises(ValueError):
        get_scheduler("nope", 1.0, 10, 10)


def test_temperature_schedules():
    assert temperature_at(0, 10, "learnable") == -1.0
    assert temperature_at(5, 10, "constant", temperature=0.07) == 0.07
    lin0 = temperature_at(0, 11, "linear", temp_start=0.1, temp_end=0.02)
    lin10 = temperature_at(10, 11, "linear", temp_start=0.1, temp_end=0.02)
    assert lin0 == pytest.approx(0.1) and lin10 == pytest.approx(0.02)
    cos_mid = temperature_at(5, 11, "cosine", temp_start=0.1, temp_end=0.02)
    assert 0.02 < cos_mid < 0.1
    exp10 = temperature_at(10, 11, "exponential", temp_start=0.1, temp_end=0.02)
    assert exp10 == pytest.approx(0.02, rel=1e-6)


def test_freeze_ratio_schedules():
    assert freeze_ratio_at(3, 10, 0.8, None) == 0.8
    assert freeze_ratio_at(0, 11, 0.8, "linear_unfreeze") == pytest.approx(0.8)
    assert freeze_ratio_at(10, 11, 0.8, "linear_unfreeze") == pytest.approx(0.0)
    assert freeze_ratio_at(10, 11, 0.8, "linear_freeze") == pytest.approx(0.8)
