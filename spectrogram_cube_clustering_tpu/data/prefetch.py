"""Async host-side prefetching: overlap Zarr reads with device compute.

The reference's input path is a torch DataLoader whose worker processes
each run a dask `.compute()` per index (ZarrDataLoader.py:69,
production.py:72-77) — per-batch H2D copies serialized with the training
step. Here the host side is a thread pool reading Zarr items ahead of
consumption and a double-buffered `jax.device_put`, so the accelerator
never waits on IO:

    reader threads -> bounded queue (host arrays) -> device_put (async) ->
    consumer gets an on-device batch while the next is already in flight.

Used when the window set exceeds HBM (`loadmode='stream'`); small datasets
take the fully device-resident layout (train.layout) instead.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np


class PrefetchLoader:
    """Iterate device-ready batches with IO/H2D overlapped.

    item_fn(i) -> np.ndarray of windows for item i; items are read by
    `num_workers` threads in index order and concatenated into fixed-size
    window batches. Each epoch yields (batch (B, H, W, C) on device,
    n_valid) with the trailing batch zero-padded.

    Multi-host: with a sharding that spans processes, every process must
    run an identical loader (same items, same order — guaranteed by the
    deterministic unshuffled iteration the DEC stale-p contract already
    requires); each host then transfers only its addressable block of
    every batch (train.layout.put_process_local). Hosts currently read
    all items and slice at transfer time — correct, but IO is not yet
    divided across hosts.
    """

    def __init__(
        self,
        item_fn: Callable[[int], np.ndarray],
        n_items: int,
        batch_size: int,
        num_workers: int = 4,
        queue_depth: int = 8,
        sharding=None,
        indices: Optional[Sequence[int]] = None,
    ):
        self.item_fn = item_fn
        self.indices = list(indices) if indices is not None else list(range(n_items))
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.queue_depth = queue_depth
        self.sharding = sharding

    def _reader(self, out_q: queue.Queue, stop: threading.Event):
        """Single ordered reader feeding the batch assembler. Items are
        fetched by a pool of threads but delivered in index order."""
        import concurrent.futures as cf

        def put(item) -> bool:
            # bounded put that notices consumer abandonment (a plain
            # blocking put would wedge this thread on a full queue forever)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            futures = {}
            lookahead = self.num_workers + 2
            submitted = 0
            for pos in range(len(self.indices)):
                while submitted < min(pos + lookahead, len(self.indices)):
                    futures[submitted] = pool.submit(
                        self.item_fn, self.indices[submitted]
                    )
                    submitted += 1
                if not put(futures.pop(pos).result()):
                    return
        put(None)  # epoch sentinel

    def __iter__(self) -> Iterator:
        item_q: queue.Queue = queue.Queue(maxsize=self.queue_depth)
        stop = threading.Event()
        reader = threading.Thread(
            target=self._reader, args=(item_q, stop), daemon=True
        )
        reader.start()

        def batches_host():
            buf = []
            have = 0
            while True:
                item = item_q.get()
                if item is None:
                    break
                buf.append(item)
                have += len(item)
                while have >= self.batch_size:
                    flat = np.concatenate(buf, axis=0)
                    yield flat[: self.batch_size], self.batch_size
                    rest = flat[self.batch_size :]
                    buf = [rest] if len(rest) else []
                    have = len(rest)
            if have:
                flat = np.concatenate(buf, axis=0)
                pad = self.batch_size - len(flat)
                flat = np.concatenate(
                    [flat, np.zeros((pad, *flat.shape[1:]), flat.dtype)]
                )
                yield flat, self.batch_size - pad

        try:
            # Double buffer: keep one device transfer in flight. On a
            # multi-host mesh each process feeds only its addressable
            # block of the batch axis (train.layout.put_process_local).
            from spectrogram_cube_clustering_tpu.train.layout import (
                put_process_local,
            )

            pending = None
            for host_batch, n_valid in batches_host():
                if self.sharding is not None:
                    dev = put_process_local(host_batch, self.sharding, axis=0)
                else:
                    dev = jax.device_put(host_batch)
                if pending is not None:
                    yield pending
                pending = (dev, n_valid)
            if pending is not None:
                yield pending
        finally:
            stop.set()


def zarr_prefetch_loader(
    dataset,
    batch_size: int,
    num_workers: int = 4,
    sharding=None,
    indices=None,
) -> PrefetchLoader:
    """PrefetchLoader over a data.cube.ZarrCubeDataset."""
    return PrefetchLoader(
        dataset.item,
        len(dataset),
        batch_size,
        num_workers=num_workers,
        sharding=sharding,
        indices=indices,
    )
