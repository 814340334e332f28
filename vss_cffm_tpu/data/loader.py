"""Prefetching host-side data loaders.

The reference feeds 4 GPUs from per-rank ``DataLoader`` worker *processes*
(``mmseg/datasets/builder.py:141-177``). On TPU the equivalent is a per-host
pipeline that keeps the chips fed: a thread pool decodes JPEG clips (cv2
releases the GIL during imdecode/resize), a bounded queue gives double
buffering, and batches land on device via ``jax.device_put`` with the batch
sharding, overlapping H2D with compute.

Determinism: the sample RNG is ``RandomState(seed, epoch, index)``-derived,
so a run is reproducible for a given seed regardless of thread scheduling
(matching the reference's seeded ``worker_init_fn`` intent,
``builder.py:160-177``).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from .vspw import VSPWVideoDataset

__all__ = ["TrainLoader", "iterate_eval", "iterate_eval_tta", "prefetch_map"]


def _sample_rng(seed: int, epoch: int, index: int) -> np.random.RandomState:
    return np.random.RandomState(
        np.random.PCG64(np.random.SeedSequence([seed, epoch, index]))
    )


class TrainLoader:
    """Infinite shuffled clip batches: (B, T, H, W, 3) f32 + (B, T, H, W) i32.

    ``shard_id``/``num_shards`` split the video list across hosts the way
    ``DistributedSampler`` splits it across ranks.
    """

    def __init__(
        self,
        dataset: VSPWVideoDataset,
        batch_size: int,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        shard_id: int = 0,
        num_shards: int = 1,
        device_normalize: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        # 0 workers = synchronous in-caller loading (DataLoader convention);
        # >=1 = that many decode threads behind a prefetch queue, clamped to
        # the core count (surplus threads measurably thrash the GIL: 4
        # workers on a 1-core host ran 15% slower than 1)
        if num_workers > 0:
            num_workers = min(num_workers, max(1, os.cpu_count() or 1))
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        # emit uint8 BGR batches; mean/std/BGR→RGB runs inside the train step
        self.device_normalize = device_normalize

    def _index_stream(self) -> Iterator[tuple[int, int]]:
        epoch = 0
        n = len(self.dataset)
        while True:
            order = np.random.RandomState(self.seed + epoch).permutation(n)
            order = order[self.shard_id :: self.num_shards]
            # drop_last semantics: only full batches (reference builder drop_last)
            usable = len(order) - len(order) % self.batch_size
            for i in order[:usable]:
                yield epoch, int(i)
            epoch += 1

    def _batch_of(self, items: list[dict]) -> dict:
        return {
            "imgs": np.stack([b["imgs"] for b in items]),
            "labels": np.stack([b["labels"] for b in items]),
            "videos": [b["video"] for b in items],
        }

    def __iter__(self) -> Iterator[dict]:
        stream = self._index_stream()
        if self.num_workers == 0:  # synchronous: load each batch in-caller
            while True:
                items = []
                for _ in range(self.batch_size):
                    epoch, idx = next(stream)
                    rng = _sample_rng(self.seed, epoch, idx)
                    items.append(self.dataset.get_train_item(
                        idx, rng, not self.device_normalize))
                yield self._batch_of(items)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # the try must cover pool construction too: an uncaught producer
            # exception would leave the consumer blocked on the queue forever
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    pending = []
                    while not stop.is_set():
                        while len(pending) < self.batch_size * 2:
                            epoch, idx = next(stream)
                            rng = _sample_rng(self.seed, epoch, idx)
                            pending.append(
                                pool.submit(self.dataset.get_train_item, idx, rng,
                                            not self.device_normalize)
                            )
                        batch_items = [pending.pop(0).result() for _ in range(self.batch_size)]
                        batch = self._batch_of(batch_items)
                        # bounded put that stays responsive to consumer exit
                        while not stop.is_set():
                            try:
                                out_q.put(batch, timeout=0.5)
                                break
                            except queue.Full:
                                continue
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_map(fn, indices, num_workers: int = 4, prefetch: int = 8) -> Iterator:
    """Yield ``fn(i)`` for each index, keeping ``prefetch`` results in flight
    on a thread pool (order-preserving). ``num_workers=0`` maps synchronously
    in the caller (same convention as ``TrainLoader``)."""
    indices = list(indices)
    if num_workers == 0:
        for i in indices:
            yield fn(i)
        return
    with ThreadPoolExecutor(num_workers) as pool:
        pending = []
        it = iter(indices)
        for _ in range(min(prefetch, len(indices))):
            pending.append(pool.submit(fn, next(it)))
        while pending:
            item = pending.pop(0).result()
            try:
                pending.append(pool.submit(fn, next(it)))
            except StopIteration:
                pass
            yield item


def iterate_eval(
    dataset: VSPWVideoDataset,
    num_workers: int = 4,
    prefetch: int = 8,
    shard_id: int = 0,
    num_shards: int = 1,
    normalize: bool = True,
) -> Iterator[dict]:
    """Sequential eval items (one clip per frame), prefetched.

    ``normalize=False`` keeps frames uint8 BGR for device-side normalization
    (4× smaller H2D; the evaluator normalizes inside jit, bit-identically)."""
    return prefetch_map(
        lambda i: dataset.get_test_item(i, normalize=normalize),
        range(shard_id, len(dataset), num_shards),
        num_workers, prefetch,
    )


def iterate_eval_tta(
    dataset: VSPWVideoDataset,
    num_workers: int = 4,
    prefetch: int = 4,
    shard_id: int = 0,
    num_shards: int = 1,
    normalize: bool = True,
) -> Iterator[dict]:
    """Prefetched multi-scale/flip TTA eval items (``--aug-test``)."""
    return prefetch_map(
        lambda i: dataset.get_test_item_tta(i, normalize=normalize),
        range(shard_id, len(dataset), num_shards),
        num_workers, prefetch,
    )
