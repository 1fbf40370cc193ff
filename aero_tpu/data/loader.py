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

import collections
import typing as tp
from concurrent.futures import ThreadPoolExecutor

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

        # Real worker pool: `num_workers` threads decode batches
        # concurrently (audio decode releases the GIL in the native IO
        # path); batches are yielded strictly in order. A bounded window
        # of in-flight batches keeps memory in check while the
        # accelerator runs the current step.
        def build(batch_idx):
            return _stack([self.dataset[int(i)] for i in batch_idx])

        window = self.num_workers + 2
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()
            batches = self._batches()
            try:
                for batch_idx in batches:
                    pending.append(pool.submit(build, batch_idx))
                    if len(pending) >= window:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
            finally:
                for f in pending:
                    f.cancel()
