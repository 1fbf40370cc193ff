"""Batched, sharded, prefetching data loader.

Replaces the reference's torch DataLoader + DistributedSampler stack
(``/root/reference/src/ddp/distrib.py:77-101``):

- train: per-epoch seeded shuffle, examples sharded across processes
  (fixing reference defect 4 — its ``set_epoch`` was never called, so
  DDP shuffling was static; here the epoch reseeds the permutation)
- eval: strided ``range(rank, N, world)`` sharding, batch 1
- background thread pool decodes/assembles the next batches while the
  accelerator runs the current step
"""

from __future__ import annotations

import queue
import threading
import typing as tp

import numpy as np


def _stack(items):
    if isinstance(items[0], tuple):
        return tuple(_stack([it[i] for it in items]) for i in range(len(items[0])))
    if isinstance(items[0], np.ndarray):
        return np.stack(items, axis=0)
    return list(items)


class Loader:
    """Iterable over batches of a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, rank: int = 0,
                 world_size: int = 1, num_workers: int = 2,
                 pad_shards: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size
        self.num_workers = max(0, num_workers)
        # train: pad shards to equal size (DistributedSampler semantics);
        # eval: unpadded strided sharding so no file is double-counted
        # (reference Subset(range(rank, N, world)), src/ddp/distrib.py:100)
        self.pad_shards = pad_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            # DistributedSampler semantics: same permutation on every
            # rank (seed + epoch), then strided sharding.
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        if self.world_size > 1:
            if self.pad_shards:
                # pad to a multiple of world_size (repeat from the front),
                # like torch DistributedSampler
                total = -(-n // self.world_size) * self.world_size
                if total > n:
                    order = np.concatenate([order, order[: total - n]])
            order = order[self.rank::self.world_size]
        return order

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> tp.Iterator[np.ndarray]:
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self):
        if self.num_workers == 0:
            for batch_idx in self._batches():
                yield _stack([self.dataset[int(i)] for i in batch_idx])
            return

        q: queue.Queue = queue.Queue(maxsize=4)
        sentinel = object()

        def producer():
            try:
                for batch_idx in self._batches():
                    q.put(_stack([self.dataset[int(i)] for i in batch_idx]))
            except BaseException as e:  # propagate into consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
