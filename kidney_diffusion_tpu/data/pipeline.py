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


def make_loader(
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
) -> Iterator[dict]:
    """Infinite iterator of {name: (B, ...) np.ndarray} batches.

    `shard_by_process=True` gives each JAX process a disjoint stripe of
    every epoch (multi-host training: each host loads only its share,
    the global batch is assembled by the sharded jit)."""
    n = len(dataset)
    assert n >= batch_size, f"dataset ({n}) smaller than batch ({batch_size})"
    rng = np.random.default_rng(seed)

    if shard_by_process:
        import jax

        proc, nproc = jax.process_index(), jax.process_count()
    else:
        proc, nproc = 0, 1

    def index_stream():
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            if nproc > 1:
                order = order[proc::nproc]
            m = len(order)
            stop = m - (m % batch_size) if drop_last else m
            for i in range(0, stop, batch_size):
                yield order[i : i + batch_size]

    out_q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))

    def producer():
        for idxs in index_stream():
            samples = list(pool.map(dataset.__getitem__, idxs))
            out_q.put(_to_batch(samples, keywords))

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    def iterator():
        while True:
            yield out_q.get()

    return iterator()


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
