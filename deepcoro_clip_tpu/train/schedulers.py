"""Learning-rate schedules (optax), keyed by the reference's scheduler names.

Reference: utils/schedulers.py:8-106 — cosine, step, cosine_warm_restart,
linear_warmup, cosine_with_warmup, cosine_with_hard_restarts_with_warmup.
The reference steps "warmup" schedules per iteration and the rest per epoch
(runners/video_constrative_learning_runner.py:257-268); here every schedule is
a pure function of the global step (XLA-friendly), with per-epoch semantics
expressed via floor(step / steps_per_epoch).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax


def get_scheduler(
    name: str,
    lr: float,
    steps_per_epoch: int,
    epochs: int,
    *,
    num_warmup_percent: float = 0.1,
    factor: float = 0.3,
    lr_step_period: int = 20,
    num_hard_restarts_cycles: float = 1.0,
    warm_restart_tmult: int = 2,
    gradient_accumulation_steps: int = 1,
    num_restarts: int = 10,
) -> optax.Schedule:
    # All schedules are evaluated at the OPTIMIZER-update count (with
    # optax.MultiSteps that is gradient_step, which only advances once per
    # accumulation window), so both the horizon and the per-epoch step count
    # are expressed in updates, not micro-steps.
    accum = max(1, gradient_accumulation_steps)
    updates_per_epoch = max(1, steps_per_epoch // accum)
    total = max(1, updates_per_epoch * epochs)
    warmup = max(1, int(total * num_warmup_percent))
    name = (name or "cosine").lower()

    if name == "cosine":
        return optax.cosine_decay_schedule(lr, decay_steps=total)

    if name == "step":
        # per-epoch step decay: lr * factor^(epoch // period)
        def sched(step):
            epoch = jnp.floor_divide(step, updates_per_epoch)
            return lr * factor ** (epoch // lr_step_period)

        return sched

    if name == "cosine_warm_restart":
        # SGDR with T_0 derived from the desired restart count, exactly the
        # reference's rule (utils/schedulers.py:66: T_0 = t_total//num_restarts
        # if t_total > num_restarts else t_total; num_restarts defaults to 10
        # and no config carries it)
        t0 = (max(1, total // max(1, num_restarts))
              if total > num_restarts else total)
        schedules = []
        boundaries = []
        t, start = t0, 0
        while start < total:
            schedules.append(optax.cosine_decay_schedule(lr, decay_steps=t))
            start += t
            boundaries.append(start)
            t *= warm_restart_tmult
        return optax.join_schedules(schedules, boundaries[:-1])

    if name == "linear_warmup":
        # linear 0→lr over warmup, then linear decay to 0 at total — HF's
        # get_linear_schedule_with_warmup, which is what the reference's
        # "linear_warmup" builds (utils/schedulers.py:76-84)
        return optax.join_schedules(
            [optax.schedules.linear_schedule(0.0, lr, warmup),
             optax.schedules.linear_schedule(lr, 0.0, max(1, total - warmup))],
            [warmup],
        )

    if name == "cosine_with_warmup":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup, decay_steps=total
        )

    if name == "cosine_with_hard_restarts_with_warmup":
        cycles = max(1, int(num_hard_restarts_cycles))
        body = max(1, total - warmup)
        per = max(1, body // cycles)
        cyc = [
            optax.cosine_decay_schedule(lr, decay_steps=per) for _ in range(cycles)
        ]
        bounds = [warmup + per * (i + 1) for i in range(cycles - 1)]
        return optax.join_schedules(
            [optax.schedules.linear_schedule(0.0, lr, warmup)] + cyc,
            [warmup] + bounds,
        )

    raise ValueError(f"unknown scheduler_name {name!r}")
