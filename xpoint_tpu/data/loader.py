"""Minimal data loader: shuffling, numpy batch collation, and a background
worker pool so host-side cv2 augmentation overlaps TPU compute.

Replaces torch DataLoader worker processes (reference train.py:54-55,
``num_worker``). Threads instead of processes: the per-sample work
(cv2 warps, h5py reads, numpy) releases the GIL, so a thread pool
parallelizes it without pickling batches across a process boundary.

On THIS container (single CPU core) ``workers=1`` is the right setting and
the default; on a real multi-core host feeding 8 chips, full-scale
MULTIPOINT training (36 GB HDF5 + cv2 warps per sample) should raise it —
the trainer wires the reference's ``training: num_worker`` key through.
Batches are handed out in deterministic order regardless of worker count
(ordered reassembly); NOTE that with ``workers > 1`` datasets drawing from
a shared RNG interleave their draws nondeterministically across threads —
the same caveat as the reference's multi-worker DataLoader.
"""
import collections
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples):
    """Stack a list of sample dicts into a batch dict of numpy arrays."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], dict):
            out[key] = collate(vals)
        elif isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals         # e.g. names
    return out


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, seed=0,
                 drop_last=True, prefetch=2, workers=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.workers = max(1, int(workers))
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _build(self, batch_idx):
        return collate([self.dataset[int(i)] for i in batch_idx])

    def __iter__(self):
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.prefetch <= 0:
            for b in batches:
                yield self._build(b)
            return

        # worker pool with ordered reassembly: up to `ahead` batches in
        # flight, yielded strictly in submission order. workers=1 keeps
        # the single-prefetch-thread behavior this container needs.
        ahead = max(self.prefetch, self.workers)
        it = iter(batches)
        pending = collections.deque()
        ex = ThreadPoolExecutor(max_workers=self.workers,
                                thread_name_prefix="xpoint-loader")
        try:
            for _ in range(ahead):
                b = next(it, None)
                if b is None:
                    break
                pending.append(ex.submit(self._build, b))
            while pending:
                batch = pending.popleft().result()
                b = next(it, None)
                if b is not None:
                    pending.append(ex.submit(self._build, b))
                yield batch
        finally:
            for f in pending:
                f.cancel()
            ex.shutdown(wait=True, cancel_futures=True)
