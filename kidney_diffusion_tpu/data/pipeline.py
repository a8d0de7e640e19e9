"""Host input pipeline: shuffling batcher with background prefetch.

Replaces the reference's `torch.utils.data.DataLoader(num_workers=8,
spawn)` (/root/reference/train.py:178-179) with a thread-pool loader +
double-buffered prefetch: dataset `__getitem__` calls run in worker
threads (the heavy lifting is numpy / the C++ slide reader, which
release the GIL), assembled batches are handed to JAX while the next
batch is already being built.

Datasets follow the reference protocol: `__len__` and
`__getitem__(i) -> dict | tuple`. Tuples are zipped with `keywords`
(the `dl_tuple_output_keywords_names` equivalent,
/root/reference/train.py:126).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np


def _to_batch(samples, keywords: Optional[Sequence[str]]):
    first = samples[0]
    if isinstance(first, dict):
        return {k: np.stack([np.asarray(s[k]) for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        assert keywords is not None and len(keywords) == len(first), (
            "tuple dataset needs matching `keywords`"
        )
        return {
            k: np.stack([np.asarray(s[i]) for s in samples])
            for i, k in enumerate(keywords)
        }
    return {"images": np.stack([np.asarray(s) for s in samples])}


class _ProducerError:
    """Queue sentinel carrying a producer-thread exception."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    """Infinite iterator of {name: (B, ...) np.ndarray} batches with a
    background producer thread.

    Unlike a bare generator, producer exceptions PROPAGATE: a dataset
    whose `__getitem__` raises (bad slide, corrupt h5 record) makes
    `next(loader)` re-raise within one batch instead of hanging training
    forever. `close()` (or use as a context manager) stops the thread
    and worker pool; it is also called automatically on error."""

    def __init__(
        self,
        dataset,
        *,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        keywords: Optional[Sequence[str]] = None,
        drop_last: bool = True,
        shard_by_process: bool = False,
    ):
        n = len(dataset)
        assert n >= batch_size, f"dataset ({n}) smaller than batch ({batch_size})"
        self._dataset = dataset
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._drop_last = drop_last
        self._keywords = keywords
        self._rng = np.random.default_rng(seed)

        if shard_by_process:
            import jax

            self._proc, self._nproc = jax.process_index(), jax.process_count()
        else:
            self._proc, self._nproc = 0, 1
        if self._nproc > 1:
            stripe = n // self._nproc
            if stripe < (batch_size if drop_last else 1):
                # without this, the index stream would yield ZERO batches
                # and the producer would spin forever
                raise ValueError(
                    f"per-process stripe ({stripe} of {n} samples over "
                    f"{self._nproc} processes) smaller than batch_size "
                    f"({batch_size}); shrink the batch or the process count"
                )

        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _index_stream(self):
        n = len(self._dataset)
        while not self._stop.is_set():
            order = self._rng.permutation(n) if self._shuffle else np.arange(n)
            if self._nproc > 1:
                # equal-length stripes: truncate to n // nproc so every
                # process sees the SAME number of batches per epoch and
                # hosts never drift onto different permutation epochs
                order = order[self._proc :: self._nproc][: n // self._nproc]
            m = len(order)
            stop = m - (m % self._batch_size) if self._drop_last else m
            for i in range(0, stop, self._batch_size):
                yield order[i : i + self._batch_size]

    def _put(self, item) -> bool:
        """Blocking put that notices close(); returns False if stopping."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self):
        try:
            for idxs in self._index_stream():
                if self._stop.is_set():
                    return
                samples = list(self._pool.map(self._dataset.__getitem__, idxs))
                if not self._put(_to_batch(samples, self._keywords)):
                    return
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            self._put(_ProducerError(exc))

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if isinstance(item, _ProducerError):
            self.close()
            raise RuntimeError("dataset worker failed") from item.exc
        return item

    def close(self):
        self._stop.set()
        # drain so a blocked producer put() can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        if self._thread.is_alive():
            self._thread.join(timeout=5.0)
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class DeviceBatchPool:
    """Device-staged cycling pool of batches.

    Round-4 hardware gotcha (CLAUDE.md): on the tunneled TPU backend
    every host->device batch upload leaks host RAM in the tunnel client
    proportionally to CUMULATIVE uploaded bytes; multi-hour training
    runs feeding a fresh numpy batch per step wedged twice at RES
    82-104 GB. Staging `size` batches on device once and cycling them
    bounds total uploads to `size + steps/refresh_every` batches
    instead of `steps`, making host RES flat over arbitrarily long
    runs while `refresh_every` keeps data diversity: one slot is
    re-filled from the source loader every `refresh_every` draws, so
    the pool walks the whole dataset over time (refresh_every=0 means
    never refresh — a fixed pool).

    `place` is applied to each source batch ONCE at staging time
    (typically the trainer's shard+upload); drawn batches come back
    already on device.
    """

    def __init__(self, source, *, size: int, place, refresh_every: int = 0):
        assert size >= 1, size
        self._source = source
        self._size = size
        self._place = place
        self._refresh_every = refresh_every
        self._slots: list = []
        self._count = 0
        self._refresh_slot = 0
        self.uploads = 0  # staged-batch counter (tests pin boundedness)

    def _stage(self):
        self.uploads += 1
        return self._place(next(self._source))

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        if len(self._slots) < self._size:
            self._slots.append(self._stage())
            batch = self._slots[-1]
        else:
            if self._refresh_every and self._count % self._refresh_every == 0:
                self._slots[self._refresh_slot] = self._stage()
                self._refresh_slot = (self._refresh_slot + 1) % self._size
            batch = self._slots[self._count % self._size]
        self._count += 1
        return batch

    def close(self):
        close = getattr(self._source, "close", None)
        if close is not None:
            close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PermutationSplit:
    """Deterministic permutation-split view over a dataset (the
    reference's `torch.utils.data.Subset` over a seeded `randperm`,
    /root/reference/train.py:162-165, train_ultra_res.py:146-155)."""

    def __init__(self, dataset, start: int, stop: int, seed: int = 0):
        self._dataset = dataset
        rng = np.random.default_rng(seed)
        self._indices = rng.permutation(len(dataset))[start:stop]

    @property
    def indices(self) -> np.ndarray:
        return self._indices

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self._dataset[int(self._indices[i])]


def train_valid_split(dataset, valid_fraction: float = 0.1, seed: int = 0):
    """90/10-style held-out split: two disjoint PermutationSplit views
    (same permutation, head = train, tail = valid)."""
    train_size = int((1 - valid_fraction) * len(dataset))
    return (
        PermutationSplit(dataset, 0, train_size, seed),
        PermutationSplit(dataset, train_size, len(dataset), seed),
    )


def make_loader(dataset, **kwargs) -> DataLoader:
    """Infinite iterator of {name: (B, ...) np.ndarray} batches.

    `shard_by_process=True` gives each JAX process a disjoint stripe of
    every epoch (multi-host training: each host loads only its share,
    the global batch is assembled by the sharded jit)."""
    return DataLoader(dataset, **kwargs)


def prefetch_to_device(iterator: Iterator[dict], *, sharding=None, depth: int = 2):
    """Double-buffered host->device transfer: the next batch's DMA
    overlaps the current step's compute."""
    import collections

    import jax

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.numpy.asarray, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    buf = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.popleft()
