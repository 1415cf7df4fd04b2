"""Multi-host helpers: host-side metadata gathering.

The reference gathers python strings/lists across ranks by pickling into
uint8 tensors (reference: runners/video_constrative_learning_runner.py:
536-619). TPU-native rule (SURVEY.md §5.8): metadata NEVER rides the device —
use process_allgather on the host. Single-process (tests, single chip) these
are identity functions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import numpy as np


def gather_objects(objs: List[Any]) -> List[Any]:
    """All-gather a per-host list of picklable objects; returns the
    concatenated global list (host-order stable)."""
    if jax.process_count() == 1:
        return list(objs)
    from jax.experimental import multihost_utils

    blob = np.frombuffer(_pickle(objs), dtype=np.uint8)
    # pad to the max length across hosts (allgather needs one shape)
    lengths = multihost_utils.process_allgather(
        np.asarray([blob.size], np.int64), tiled=False
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: blob.size] = blob
    gathered = multihost_utils.process_allgather(padded, tiled=False)
    out: List[Any] = []
    for row, n in zip(gathered, lengths):
        out.extend(_unpickle(bytes(np.asarray(row[: int(n)]))))
    return out


def gather_arrays(x: np.ndarray) -> np.ndarray:
    """Concatenate a per-host numpy array across hosts along axis 0."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.concatenate(
        list(multihost_utils.process_allgather(np.asarray(x), tiled=False))
    )


def broadcast_from_host0(obj: Any) -> Any:
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(obj)


def _pickle(o) -> bytes:
    import pickle

    return pickle.dumps(o)


def _unpickle(b: bytes):
    import pickle

    return pickle.loads(b)
