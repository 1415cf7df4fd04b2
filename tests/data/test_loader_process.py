"""Process-backend loader: bit-identical to the thread backend.

Datasets seed a fresh generator per (seed, epoch, index)
(data/datasets.py::_item_rng), so items are deterministic regardless of
which worker produces them — the two backends must agree exactly. The toy
dataset here mimics that discipline and records the producing PID so the
test can assert work actually left the parent process.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from deepcoro_clip_tpu.data.loader import PrefetchLoader


class ToyDataset:
    """Picklable; per-index seeded like the real datasets."""

    def __init__(self, n: int):
        self.n = n
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        rng = np.random.default_rng((7, self.epoch, i))
        return {"x": rng.normal(size=(4,)).astype(np.float32),
                "i": i, "pid": os.getpid()}


def _collate(items):
    return {
        "x": np.stack([it["x"] for it in items]),
        "i": np.array([it["i"] for it in items]),
        "pids": {it["pid"] for it in items},
    }


BATCHES = [[0, 1, 2], [3, 4, 5], [6, 7], [8, 9, 10, 11]]


def _run(backend: str):
    loader = PrefetchLoader(ToyDataset(12), list(BATCHES), _collate,
                            num_workers=2, backend=backend)
    return list(loader)


@pytest.mark.slow
def test_process_backend_matches_thread_backend():
    thread = _run("thread")
    proc = _run("process")
    assert len(thread) == len(proc) == len(BATCHES)
    child_pids = set()
    for t, p in zip(thread, proc):
        np.testing.assert_array_equal(t["x"], p["x"])
        np.testing.assert_array_equal(t["i"], p["i"])
        child_pids |= p["pids"]
    assert os.getpid() not in child_pids  # items were made in the workers
    # thread backend runs in-process
    assert {os.getpid()} == set().union(*(t["pids"] for t in thread))


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        PrefetchLoader(ToyDataset(2), [[0]], _collate, backend="fork")


class _BadDataset(ToyDataset):  # module level: spawn pickles the dataset
    def __getitem__(self, i):
        if i == 3:
            raise RuntimeError("boom at 3")
        return super().__getitem__(i)


@pytest.mark.slow
def test_process_backend_surfaces_worker_errors():
    loader = PrefetchLoader(_BadDataset(6), [[0, 1], [2, 3]], _collate,
                            num_workers=1, backend="process")
    with pytest.raises(RuntimeError, match="boom at 3"):
        list(loader)
