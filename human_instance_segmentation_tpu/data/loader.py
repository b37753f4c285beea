"""Host-side data loading: worker threads + device prefetch.

Replaces the reference's torch DataLoader worker processes
(config_manager.py:131, num_workers up to 32): a thread pool builds batches
ahead of the train loop (PIL decode and numpy work release the GIL), and
`prefetch_to_device` keeps N batches resident on the accelerator so the
jitted step never waits on host->device transfer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .dataset import collate


class ThreadedLoader:
    """Iterates batches assembled by worker threads, `prefetch` ahead."""

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(prefetch, 1)

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        n_usable = len(order) - (len(order) % self.batch_size if self.drop_last else 0)
        starts = list(range(0, n_usable, self.batch_size))

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def build(start):
            idxs = order[start:start + self.batch_size]
            return collate([self.dataset[int(i)] for i in idxs])

        def producer():
            # Submit lazily: at most num_workers + prefetch batches in flight,
            # so a stalled consumer (compile, checkpoint save) bounds host RAM
            # instead of letting the pool race an epoch ahead.
            max_inflight = self.num_workers + self.prefetch
            with ThreadPoolExecutor(self.num_workers) as pool:
                pending = [pool.submit(build, s) for s in starts[:max_inflight]]
                next_start = max_inflight
                for f in pending:  # appended to while iterating
                    if stop.is_set():
                        break
                    q.put(f.result())
                    if next_start < len(starts):
                        pending.append(pool.submit(build, starts[next_start]))
                        next_start += 1
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def forever(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = 0
        while True:
            yield from self.epoch(epoch)
            epoch += 1


def prefetch_to_device(iterator: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Keep `size` batches already transferred to the device(s) while the
    previous step computes (the pinned-memory + non_blocking copy analogue,
    dataset.py H2D at train_advanced.py:682-684)."""
    import collections

    import jax

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    buf: "collections.deque" = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
