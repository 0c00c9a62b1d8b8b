"""Batch feeding: infinite shuffled iterator with per-host sharding and
simple double-buffered host->device prefetch.

Replaces the reference's torch DataLoader + `cycle` (vddp.py:42-45, 1471):
batches are assembled by vectorized numpy slicing over the packed cache (see
dataset.py), so no worker pool is needed; the next batch is prepared while the
device computes the current step.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Iterator

import numpy as np


class InfiniteBatchSampler:
    """Shuffled epochs of indices, optionally sharded across hosts: each
    process sees a disjoint contiguous stripe per epoch (the SPMD analogue of
    DistributedSampler)."""

    def __init__(self, num_examples: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True, process_index: int = 0,
                 process_count: int = 1, drop_last: bool = True):
        assert num_examples > 0
        self.n = num_examples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last

    def epoch(self, epoch_idx: int) -> Iterator[np.ndarray]:
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = (rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        # per-host stripe
        per = self.n // self.process_count
        if per == 0:
            stripe = order
        else:
            start = self.process_index * per
            end = start + per if self.process_index < self.process_count - 1 \
                else self.n
            stripe = order[start:end]
        bs = self.batch_size
        stop = len(stripe) - bs + 1 if self.drop_last else len(stripe)
        for i in range(0, max(stop, 1 if not self.drop_last else 0), bs):
            batch = stripe[i:i + bs]
            if self.drop_last and len(batch) < bs:
                return
            yield batch

    def __iter__(self) -> Iterator[np.ndarray]:
        e = 0
        while True:
            yielded = False
            for b in self.epoch(e):
                yielded = True
                yield b
            e += 1
            if not yielded and self.drop_last:
                # dataset smaller than batch: fall back to sampling with
                # replacement so tiny smoke datasets still train
                rng = np.random.default_rng((self.seed, e, 17))
                yield rng.integers(0, self.n, size=self.batch_size)


def prefetch_batches(dataset, sampler: InfiniteBatchSampler,
                     put_fn=None, queue_size: int = 2):
    """Generator of (videos, labels) with a background producer thread.
    `put_fn` (e.g. a jax.device_put with sharding) runs on the consumer side
    so device placement stays on the main thread."""
    q: Queue = Queue(maxsize=queue_size)
    stop = threading.Event()

    def producer():
        for idx in sampler:
            if stop.is_set():
                return
            q.put(dataset.get_batch(idx))

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    try:
        while True:
            batch = q.get()
            yield put_fn(batch) if put_fn is not None else batch
    finally:
        stop.set()
