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


# ---------------------------------------------------------------- processes
# Process-pool worker path (reference ``builder.py:141-177`` uses DataLoader
# worker *processes*): for hosts where the thread path plateaus — the
# python-side share of an item (file reads, RNG draws, ctypes marshalling,
# ~2% measured) caps thread scaling near ~50 cores, and any cv2 build that
# holds the GIL caps it far lower. Workers are spawned (never forked — the
# parent holds a live TPU client), each builds its own dataset + native
# decoder, and items return through POSIX shared memory so the 2.8 MB clip
# crosses process boundaries with one copy instead of pickle+pipe's two.

_PROC_DS: VSPWVideoDataset | None = None


def _proc_init(dataset: VSPWVideoDataset) -> None:
    global _PROC_DS
    _PROC_DS = dataset


def _proc_item(args) -> tuple:
    from multiprocessing import resource_tracker, shared_memory

    seed, epoch, idx, normalize = args
    rng = _sample_rng(seed, epoch, idx)
    item = _PROC_DS.get_train_item(idx, rng, normalize)
    imgs, labels = np.ascontiguousarray(item["imgs"]), np.ascontiguousarray(item["labels"])
    shm = shared_memory.SharedMemory(create=True, size=imgs.nbytes + labels.nbytes)
    np.ndarray(imgs.shape, imgs.dtype, buffer=shm.buf)[:] = imgs
    np.ndarray(labels.shape, labels.dtype, buffer=shm.buf,
               offset=imgs.nbytes)[:] = labels
    meta = (shm.name, imgs.shape, imgs.dtype.str, labels.shape,
            labels.dtype.str, item["video"])
    # the parent unlinks; unregister here so this process's resource tracker
    # doesn't double-free at exit (stdlib tracker is per-creating-process)
    try:
        resource_tracker.unregister(shm._name, "shared_memory")  # noqa: SLF001
    except Exception:
        pass
    shm.close()
    return meta


def _proc_collect(meta) -> dict:
    from multiprocessing import shared_memory

    name, ishape, idt, lshape, ldt, video = meta
    shm = shared_memory.SharedMemory(name=name)
    try:
        imgs = np.array(np.ndarray(ishape, np.dtype(idt), buffer=shm.buf))
        nbytes = imgs.nbytes
        labels = np.array(np.ndarray(lshape, np.dtype(ldt), buffer=shm.buf,
                                     offset=nbytes))
    finally:
        shm.close()
        shm.unlink()
    return {"imgs": imgs, "labels": labels, "video": video}


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
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        # 0 workers = synchronous in-caller loading (DataLoader convention);
        # >=1 = that many decode workers behind a prefetch queue, clamped to
        # the core count (surplus threads measurably thrash the GIL: 4
        # workers on a 1-core host ran 15% slower than 1).
        # worker_mode: "thread" (default — the native decode path releases
        # the GIL) or "process" (spawned workers + shared-memory transport,
        # the reference DataLoader shape — for hosts where threads plateau).
        if num_workers > 0:
            num_workers = min(num_workers, max(1, os.cpu_count() or 1))
        self.num_workers = num_workers
        assert worker_mode in ("thread", "process"), worker_mode
        self.worker_mode = worker_mode
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
                if self.worker_mode == "process":
                    from concurrent.futures import ProcessPoolExecutor
                    from multiprocessing import get_context

                    pool_cm = ProcessPoolExecutor(
                        self.num_workers, mp_context=get_context("spawn"),
                        initializer=_proc_init, initargs=(self.dataset,))

                    def submit(pool, epoch, idx):
                        return pool.submit(
                            _proc_item,
                            (self.seed, epoch, idx, not self.device_normalize))

                    def resolve(fut):
                        return _proc_collect(fut.result())
                else:
                    pool_cm = ThreadPoolExecutor(self.num_workers)

                    def submit(pool, epoch, idx):
                        rng = _sample_rng(self.seed, epoch, idx)
                        return pool.submit(self.dataset.get_train_item, idx,
                                           rng, not self.device_normalize)

                    def resolve(fut):
                        return fut.result()

                with pool_cm as pool:
                    pending = []
                    while not stop.is_set():
                        while len(pending) < self.batch_size * 2:
                            epoch, idx = next(stream)
                            pending.append(submit(pool, epoch, idx))
                        batch_items = [resolve(pending.pop(0))
                                       for _ in range(self.batch_size)]
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
