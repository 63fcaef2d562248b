"""Threaded prefetching batch loader feeding device-sharded batches.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers,
prefetch_factor=2)`` (train.py:265-276) with a thread-pool pipeline: worker
threads run the (numpy/cv2, GIL-releasing) dataset ``__getitem__``; a
bounded queue holds ready batches; optionally each batch is placed on the
mesh with the batch axis sharded (``data`` axis) so the jitted train step
consumes device-resident input.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from mintime_tpu.data.dataset import collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = False,
        seed: int = 0,
        mesh=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.seed = seed
        self.mesh = mesh
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> list[list[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(idx)
        out = [
            idx[i : i + self.batch_size].tolist()
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and out and len(out[-1]) < self.batch_size:
            out.pop()
        return out

    def __iter__(self) -> Iterator[dict]:
        batches = self._batches()
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if self.mesh is not None:
                    from mintime_tpu.parallel.mesh import shard_batch

                    arrays = {
                        k: v for k, v in item.items() if isinstance(v, np.ndarray)
                    }
                    rest = {k: v for k, v in item.items() if k not in arrays}
                    item = {**shard_batch(self.mesh, arrays), **rest}
                yield item
        finally:
            stop.set()
