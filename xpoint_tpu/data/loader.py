"""Minimal data loader: shuffling, numpy batch collation, and background
thread prefetch so host-side cv2 augmentation overlaps TPU compute.

Replaces torch DataLoader worker processes (reference train.py:54-55). The
container has a single CPU core, so one prefetch thread (which releases the
GIL inside cv2/h5py/numpy) is the right amount of host parallelism.

SCALABILITY NOTE: on a real multi-core host feeding 8 chips, full-scale
MULTIPOINT training (36 GB HDF5 + cv2 warps per sample) will be bound by
this single prefetch thread. The fix when that day comes is a worker POOL
(multiprocessing or N threads — cv2/h5py release the GIL) filling the same
queue; the consumer contract below does not change. Sized-for-this-container
is deliberate, not a design limit.
"""
import queue
import threading

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
                 drop_last=True, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
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

    def __iter__(self):
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.prefetch <= 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error = []

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        break
                    q.put(collate([self.dataset[int(i)] for i in b]))
            except BaseException as e:          # propagate to the consumer
                error.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    if error:
                        raise error[0]
                    break
                yield batch
        finally:
            stop.set()
