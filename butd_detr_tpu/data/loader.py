"""Batched, prefetching data loader (host side).

Replaces the reference's torch DataLoader + DistributedSampler
(main_utils.py:197-233) with a dependency-free loader designed for a TPU
input pipeline:

  * fixed-shape numpy batches (every sample is already padded);
  * per-process sharding for multi-host SPMD: each JAX process loads only
    its slice of the global batch (DistributedSampler equivalent);
  * worker processes + double-buffered prefetch so augmentation (50k-point
    numpy work per sample, the reference's hot CPU path per SURVEY.md
    section 3.2) overlaps with the device step;
  * deterministic seeding: sample rng = f(base_seed, epoch, index), the
    TPU analogue of the reference's seed_worker (main_utils.py:199-207).
"""

from concurrent.futures import ProcessPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

# keys that stay python lists (strings / scalars for the evaluator)
_META_KEYS = ("scan_ids", "utterances", "relation", "target_name")


def collate(samples: List[Dict]) -> Dict:
    """Stack a list of fixed-shape sample dicts into a batch dict.

    Integer arrays are emitted as int32: JAX (x64 disabled) canonicalizes
    int64 to int32 at transfer anyway, so shipping numpy's default int64
    would just double the host->device bytes and force an extra copy."""
    out = {}
    for k in samples[0]:
        if k in _META_KEYS:
            out[k] = [s[k] for s in samples]
        else:
            v = np.stack([np.asarray(s[k]) for s in samples])
            if v.dtype == np.int64:
                v = v.astype(np.int32)
            out[k] = v
    return out


_WORKER_DS = None


def _worker_init(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _worker_get(args):
    index, seed = args
    return _WORKER_DS.get(index, np.random.RandomState(seed))


class DataLoader:
    """Iterates seeded, sharded, fixed-shape batches of a map-style dataset
    (anything with __len__ and get(index, rng))."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 0,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size  # per-process batch
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self._pool = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(
                (self.seed * 1_000_003 + self.epoch) % (2**31)
            ).shuffle(order)
        # contiguous shard per process (same count everywhere)
        per = n // self.process_count
        return order[self.process_index * per:(self.process_index + 1) * per]

    def _sample_seed(self, index: int) -> int:
        return int(
            (self.seed * 2_000_003 + self.epoch * 1_000_003 + index)
            % (2**31)
        )

    def _get_pool(self):
        if self._pool is None and self.num_workers > 0:
            # spawn, not fork: the loader lives inside the (multithreaded)
            # JAX training process, and forking it can deadlock. Workers
            # receive the dataset once via the initializer pickle — at
            # real-ScanNet scale that serializes the scans dict per worker
            # at pool creation (one-time, amortized over the epoch) and
            # duplicates it in worker RSS where fork shared pages; if that
            # bites, point workers at the {split}_v3scans.pkl cache and
            # let them load it themselves instead of pickling `dataset`.
            import multiprocessing as mp

            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                initializer=_worker_init,
                initargs=(self.dataset,),
                mp_context=mp.get_context("spawn"),
            )
        return self._pool

    def __iter__(self) -> Iterator[Dict]:
        idx = self._indices()
        nb = len(self)
        batches, valids = [], []
        for i in range(nb):
            b = idx[i * self.batch_size:(i + 1) * self.batch_size]
            valids.append(len(b))
            if len(b) < self.batch_size:
                # drop_last=False tail: pad to the fixed batch shape by
                # cyclic repetition (torch DistributedSampler pads the
                # same way). "__valid__" tells the eval loop how many
                # leading rows are real so evaluator counters stay exact.
                b = np.resize(b, self.batch_size)
            batches.append(b)

        def finish(batch, valid):
            if valid < self.batch_size:
                batch["__valid__"] = valid
            return batch

        if self.num_workers == 0:
            for b, v in zip(batches, valids):
                yield finish(collate([
                    self.dataset.get(
                        int(i), np.random.RandomState(self._sample_seed(int(i)))
                    )
                    for i in b
                ]), v)
            return

        pool = self._get_pool()

        def submit(b):
            args = [(int(i), self._sample_seed(int(i))) for i in b]
            return [pool.submit(_worker_get, a) for a in args]

        inflight = []
        bi = out = 0
        while bi < len(batches) or inflight:
            while bi < len(batches) and len(inflight) < self.prefetch:
                inflight.append(submit(batches[bi]))
                bi += 1
            futs = inflight.pop(0)
            yield finish(collate([f.result() for f in futs]), valids[out])
            out += 1

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None
