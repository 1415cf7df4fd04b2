"""TPU profiling: jax profiler traces (xprof).

The reference has no profiler integration (SURVEY.md §5.1 — ad-hoc CUDA
memory prints). Here: a context manager + CLI hook writing xprof traces that
open in TensorBoard / xprof, plus simple device-memory stats.
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "profiles") -> Iterator[None]:
    """``with trace('profiles'): run_steps()`` -> xprof trace directory."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device live-buffer stats (the reference's _log_memory_stats role,
    runners/multitask_runner.py:208-262)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out
