"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's entire distributed story is data parallelism over NCCL
(SURVEY §2.4): DDP gradient all-reduce, SyncBN stat all-reduce, scalar-log
all-reduce. TPU-natively all of that collapses into *one* mesh axis and
GSPMD: batches are sharded over ``data``, parameters are replicated, and
every cross-device reduction (grad sum, BN batch moments, loss means,
confusion-matrix accumulation) is an XLA collective inserted automatically
by jit over ICI. No explicit backend code — the mesh *is* the backend.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "create_clip_mesh",
    "shard_batch",
    "shard_clip_batch",
    "replicate",
    "batch_sharding",
]


def create_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def create_clip_mesh(devices=None, frame_axis: int = 4) -> Mesh:
    """2-D (data, frames) mesh for clip-level frame parallelism.

    CFFM's frames are embarrassingly parallel through the backbone and the
    per-frame decode (reference ``encoder_decoder.py:436-441`` flattens
    (B, T) into one frame batch); only the 1/8 fused features meet in the
    CFFM block, and the reference frames enter it solely as *pooled* coarse
    windows. Sharding the T axis therefore runs each frame's encoder on its
    own chip and all-gathers only small pooled tensors over ICI — the
    sequence-parallel axis SURVEY §2.4 identifies, with GSPMD inserting the
    collectives.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    frame_axis = min(frame_axis, n)
    while n % frame_axis:
        frame_axis -= 1
    return Mesh(np.asarray(devices).reshape(n // frame_axis, frame_axis),
                ("data", "frames"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def _global_put(x, sharding: NamedSharding):
    """device_put that also works under multi-process (multi-host) JAX.

    Single process: plain ``device_put``. Multi-process: each process holds
    only its *local* slice of the batch (``TrainLoader`` shards the video
    list per host, the way the reference's ``DistributedSampler`` does —
    ``datasets/builder.py:119-121``), so the global array is assembled from
    the per-process shards without any cross-host data movement.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: _global_put(x, sharding), batch)


def shard_clip_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard (B, T, ...) arrays over a (data, frames) mesh."""
    sharding = NamedSharding(mesh, P("data", "frames"))
    return jax.tree.map(lambda x: _global_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh.

    Every process computes identical values (same seed), so under
    multi-process JAX the replicated global array is assembled from each
    process's full copy.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: _global_put(x, sharding), tree)
