"""Batched, sharded, prefetching host-side data loader.

Replaces torch ``DataLoader`` + ``DistributedSampler`` (src/trainers/
train_lidf.py:162-188): deterministic per-epoch shuffling, per-host index
sharding (each host loads only its slice; chips within a host get their
sub-batch via the 'data'-sharded device_put), and a thread-pool prefetcher
(the torch worker processes' role — our decode path is numpy/cv2 which
releases the GIL). The C++ native runtime (native/) provides a faster decode
core when built.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

_STACK_KEYS = ("rgb", "depth", "depth_corrupt", "xyz", "xyz_corrupt",
               "corrupt_mask", "valid_mask", "fx", "fy", "cx", "cy")


def collate(samples) -> Dict[str, np.ndarray]:
    batch = {k: np.stack([s[k] for s in samples]) for k in _STACK_KEYS}
    if "pred_mask" in samples[0]:  # optional: mask_type='pred' eval
        batch["pred_mask"] = np.stack([s["pred_mask"] for s in samples])
    batch["item_path"] = [s["item_path"] for s in samples]
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, num_workers: int = 4,
                 host_id: int = 0, num_hosts: int = 1, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        # pad so every host sees the same number of batches (DistributedSampler
        # semantics: wrap around rather than drop)
        per_host = -(-n // self.num_hosts)
        if self.drop_last:
            per_host = (per_host // self.batch_size) * self.batch_size
        total = per_host * self.num_hosts
        if total > n:
            idx = np.concatenate([idx, idx[: total - n]])
        else:
            idx = idx[:total]
        return idx[self.host_id::self.num_hosts]

    def steps_per_epoch(self) -> int:
        n = len(self._epoch_indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batches, loading samples in a thread pool with prefetch."""
        indices = self._epoch_indices(epoch)
        n_batches = self.steps_per_epoch()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    chunk = indices[b * self.batch_size:(b + 1) * self.batch_size]
                    futs = [pool.submit(self.dataset.__getitem__, int(i), epoch)
                            for i in chunk]
                    try:
                        out_q.put(collate([f.result() for f in futs]))
                    except Exception as e:  # surface loader errors to consumer
                        out_q.put(e)
                        return
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
