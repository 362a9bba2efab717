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

from spectrogram_cube_clustering_tpu.core.precision import (
    quantize_wire as _quantize_wire,
)


class _ReaderError:
    """Queue sentinel carrying a reader-thread exception to the consumer."""

    def __init__(self, error: BaseException):
        self.error = error


class PrefetchLoader:
    """Iterate device-ready batches with IO/H2D overlapped.

    item_fn(i) -> np.ndarray of windows for item i; items are read by
    `num_workers` threads in index order and concatenated into fixed-size
    window batches. Each epoch yields (batch (B, H, W, C) on device,
    n_valid) with the trailing batch zero-padded.

    Multi-host: with a sharding that spans processes, every process runs
    an identical loader (same items, same order — guaranteed by the
    deterministic unshuffled iteration the DEC stale-p contract already
    requires) and each host transfers only its addressable block of every
    batch. When `item_windows` (windows per item: an int, or one count
    per item) is given, each host also READS only the items its block
    needs — IO divides ~1/n_processes across the pod; without it, hosts
    read everything and slice at transfer time
    (train.layout.put_process_local).

    `transfer_dtype` ('bfloat16' | 'float16' | 'int8') re-encodes each
    assembled host batch before the host->device copy — the streaming
    tier is transfer-bound on bandwidth-limited links, so shrinking the
    wire bytes buys throughput directly (same knob and rationale as
    serve.py's transfer_dtype). Float wires are a cast; the int8 wire is
    per-batch symmetric quantization whose scale rides along as a header
    (core.precision.quantize_wire), making the yielded batch a
    {'q', 'scale'} pytree. Consumers restore f32 on device inside their
    jitted steps (train.aec.make_step_fns / train.dec.make_stream_fns
    call core.precision.dequant_wire), so the only effect is input
    quantization of the raw windows.
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
        item_windows=None,
        item_meta: Optional[tuple] = None,
        transfer_dtype: Optional[str] = None,
    ):
        from spectrogram_cube_clustering_tpu.core.precision import wire_dtype

        self.item_fn = item_fn
        self.indices = list(indices) if indices is not None else list(range(n_items))
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.queue_depth = queue_depth
        self.sharding = sharding
        self.item_windows = item_windows
        self._wire = wire_dtype(transfer_dtype)
        # (window_shape, dtype) when known up front — spares the
        # process-local path its read-item-0 shape probe
        if item_meta is not None:
            self._item_meta = (tuple(item_meta[0]), np.dtype(item_meta[1]))

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

        try:
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
        except BaseException as e:  # noqa: BLE001
            # surface the failure in the consumer: dying silently here
            # would leave the training loop blocked on item_q.get() forever
            put(_ReaderError(e))
            return
        put(None)  # epoch sentinel

    def _spans_processes(self) -> bool:
        return self.sharding is not None and not getattr(
            self.sharding, "is_fully_addressable", True
        )

    def _iter_process_local(self) -> Iterator:
        """Per-host IO division: read only the items whose windows fall in
        this process's block of each global batch, assemble the local
        block, and hand it to `jax.make_array_from_process_local_data`.

        Requires `item_windows` so the window→item map is known without
        reading. Iteration stays globally deterministic: every process
        sees the same batch sequence, only the rows it materializes
        differ."""
        import concurrent.futures as cf

        from spectrogram_cube_clustering_tpu.train.layout import process_block

        if np.isscalar(self.item_windows):
            wins = [int(self.item_windows)] * len(self.indices)
        else:
            wins = [int(self.item_windows[i]) for i in self.indices]
        cum = np.concatenate([[0], np.cumsum(wins)])
        total = int(cum[-1])
        if total == 0:
            # zero batches, matching the single-host path (a phantom
            # all-pad batch with n_valid=0 would NaN mean-by-n_valid
            # consumers; the shape probe below would also crash on an
            # empty index list)
            return
        bsz = self.batch_size
        n_batches = -(-total // bsz)

        # window shape/dtype probe: read item 0 ONCE per loader lifetime
        # (cached) — DEC re-iterates the loader per refresh and the probe
        # item may not even be in this host's block
        meta = getattr(self, "_item_meta", None)
        if meta is None:
            first = self.item_fn(self.indices[0])
            wshape, dtype = first.shape[1:], first.dtype
            self._item_meta = (wshape, dtype)
        else:
            first = None
            wshape, dtype = meta
        lo, hi = process_block(self.sharding, (bsz, *wshape), axis=0)

        # plan: per batch, (item position, offset within item, rows) runs
        plans = []
        for b in range(n_batches):
            g0, g1 = b * bsz + lo, b * bsz + hi
            valid_end = min(g1, total)
            segs = []
            g = g0
            while g < valid_end:
                ip = int(np.searchsorted(cum, g, "right") - 1)
                take = int(min(valid_end, cum[ip + 1]) - g)
                segs.append((ip, int(g - cum[ip]), take))
                g += take
            plans.append(segs)
        last_use = {}
        for b, segs in enumerate(plans):
            for ip, _, _ in segs:
                last_use[ip] = b

        def local_batches():
            # pos -> future|None (None marks the already-read probe item)
            futures = {0: None} if first is not None else {}
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                def ensure(pos):
                    if pos not in futures:
                        futures[pos] = pool.submit(
                            self.item_fn, self.indices[pos]
                        )

                for b, segs in enumerate(plans):
                    # prefetch this batch's and the next batch's items
                    for s in segs:
                        ensure(s[0])
                    if b + 1 < n_batches:
                        for s in plans[b + 1]:
                            ensure(s[0])
                    parts = []
                    for ip, off, take in segs:
                        f = futures[ip]
                        item = first if ip == 0 and f is None else f.result()
                        parts.append(item[off : off + take])
                        if last_use[ip] == b:
                            futures.pop(ip, None)
                    rows = sum(s[2] for s in segs)
                    if rows < hi - lo:  # padded tail of the last batch
                        parts.append(
                            np.zeros((hi - lo - rows, *wshape), dtype)
                        )
                    # parts is never empty here: every process owns at
                    # least one row (hi > lo), and rows < hi - lo just
                    # appended the zero tail when segs was empty
                    local = np.ascontiguousarray(
                        np.concatenate(parts, axis=0)
                    )
                    n_valid = min(bsz, total - b * bsz)
                    yield local, n_valid

        pending = None
        for local, n_valid in local_batches():
            enc = _quantize_wire(local, self._wire)
            if isinstance(enc, dict):
                # int8 wire: codes AND the per-sample scale header both
                # cross batch-sharded — each process quantizes and ships
                # exactly its local block, SPMD-consistently
                dev = {
                    "q": jax.make_array_from_process_local_data(
                        self.sharding, enc["q"], (bsz, *wshape)
                    ),
                    "scale": jax.make_array_from_process_local_data(
                        self.sharding, enc["scale"],
                        (bsz, *([1] * len(wshape))),
                    ),
                }
            else:
                dev = jax.make_array_from_process_local_data(
                    self.sharding, enc, (bsz, *wshape)
                )
            if pending is not None:
                yield pending
            pending = (dev, n_valid)
        if pending is not None:
            yield pending

    def __iter__(self) -> Iterator:
        if self._spans_processes() and self.item_windows is not None:
            yield from self._iter_process_local()
            return
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
                if isinstance(item, _ReaderError):
                    raise RuntimeError(
                        "prefetch reader failed"
                    ) from item.error
                buf.append(item)
                have += len(item)
                if have < self.batch_size:
                    continue
                # one concatenate per refill, then yield view windows at a
                # moving offset — re-concatenating the shrinking remainder
                # per batch would memcpy each item's tail O(item/batch)
                # times on this hot feed path
                flat = buf[0] if len(buf) == 1 else np.concatenate(buf)
                off = 0
                while have - off >= self.batch_size:
                    yield flat[off : off + self.batch_size], self.batch_size
                    off += self.batch_size
                rest = flat[off:]
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

            def transfer(host_arr):
                if self.sharding is not None:
                    return put_process_local(host_arr, self.sharding, axis=0)
                return jax.device_put(host_arr)

            pending = None
            for host_batch, n_valid in batches_host():
                enc = _quantize_wire(host_batch, self._wire)
                if isinstance(enc, dict):  # int8 wire: codes + scale header
                    dev = {k: transfer(v) for k, v in enc.items()}
                else:
                    dev = transfer(enc)
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
    transfer_dtype=None,
) -> PrefetchLoader:
    """PrefetchLoader over a data.cube.ZarrCubeDataset."""
    return PrefetchLoader(
        dataset.item,
        len(dataset),
        batch_size,
        num_workers=num_workers,
        sharding=sharding,
        indices=indices,
        # fixed windows per item -> multi-host runs divide IO per process
        item_windows=dataset.windows_per_item,
        item_meta=(dataset.window_shape, np.float32),
        transfer_dtype=transfer_dtype,
    )
