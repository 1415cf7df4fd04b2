"""Prefetching data loader (thread or process workers).

Replaces torch DataLoader worker processes (reference:
dataloaders/video_clip_dataset.py:971-1073 — workers, pin_memory,
persistent_workers, prefetch_factor). The TPU host feeds one SPMD program, so
the loader is: a worker pool decoding samples ahead of time + a bounded queue
of collated host batches, double-buffered against the device step.

Backends:
- ``thread`` (default): ThreadPoolExecutor. The decode/resize hot path runs
  in the C++ fastvideo library, which releases the GIL during the foreign
  call, so threads scale for the heavy work; Python-side sample assembly
  stays serialized.
- ``process``: spawn workers, each holding a pickled copy of the dataset
  (items are deterministic regardless of which worker runs them — datasets
  seed a fresh generator per (seed, epoch, index)). Use on many-core hosts
  where Python-side work (CSV rows, tokenization, augment sampling) is the
  bottleneck. One pool is spawned per epoch (workers re-import the
  interpreter, ~seconds) and ``JAX_PLATFORMS=cpu`` is exported around the
  spawn so workers never touch the TPU; collation stays in the parent, so
  ``collate_fn`` does not need to be picklable. Spawn re-imports the
  ``__main__`` module, so the launching script must be import-safe (all
  shipped entry points guard with ``if __name__ == "__main__"``).
"""

from __future__ import annotations

import os
import queue
import threading
from collections import deque
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

_PROC_DATASET = None


def _proc_init(dataset) -> None:
    global _PROC_DATASET
    _PROC_DATASET = dataset


def _proc_items(idxs):
    return [_PROC_DATASET[i] for i in idxs]


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        sampler,
        collate_fn: Callable,
        num_workers: int = 2,
        prefetch_batches: int = 2,
        backend: str = "thread",
    ):
        if backend not in ("thread", "process"):
            raise ValueError(f"unknown loader backend {backend!r}")
        self.dataset = dataset
        self.sampler = sampler
        self.collate_fn = collate_fn
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch_batches)
        self.backend = backend

    def __len__(self) -> int:
        return len(self.sampler)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # round-robin positive rotation

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = list(self.sampler)
        if not batches:
            return
        if self.backend == "process":
            yield from self._iter_process(batches)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, idxs))
                        q.put(self.collate_fn(items))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def _iter_process(self, batches) -> Iterator[Dict[str, Any]]:
        """Spawned worker processes decode items; collation (and therefore
        any non-picklable collate_fn) stays in this process. Bounded
        lookahead (num_workers + prefetch in flight) gives backpressure."""
        import multiprocessing as mp

        prev = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"  # workers must never grab the TPU
        try:
            ctx = mp.get_context("spawn")
            with ProcessPoolExecutor(
                self.num_workers, mp_context=ctx,
                initializer=_proc_init, initargs=(self.dataset,),
            ) as pool:
                pending: deque = deque()
                it = iter(batches)

                def top_up():
                    while len(pending) < self.num_workers + self.prefetch:
                        idxs = next(it, None)
                        if idxs is None:
                            return
                        pending.append(pool.submit(_proc_items, list(idxs)))

                top_up()
                while pending:
                    items = pending.popleft().result()
                    top_up()  # keep the pipeline full before collating
                    yield self.collate_fn(items)
        finally:
            if prev is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = prev
