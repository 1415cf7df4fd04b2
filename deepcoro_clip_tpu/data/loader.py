"""Threaded prefetching data loader.

Replaces torch DataLoader worker processes (reference:
dataloaders/video_clip_dataset.py:971-1073 — workers, pin_memory,
persistent_workers, prefetch_factor). The TPU host feeds one SPMD program, so
the loader is: a thread pool decoding samples ahead of time + a bounded queue
of collated host batches, double-buffered against the device step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        sampler,
        collate_fn: Callable,
        num_workers: int = 2,
        prefetch_batches: int = 2,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.collate_fn = collate_fn
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch_batches)

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
