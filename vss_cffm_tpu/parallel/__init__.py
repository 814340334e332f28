from .mesh import (
    batch_sharding,
    create_clip_mesh,
    create_mesh,
    replicate,
    shard_batch,
    shard_clip_batch,
)

__all__ = [
    "batch_sharding",
    "create_clip_mesh",
    "create_mesh",
    "replicate",
    "shard_batch",
    "shard_clip_batch",
]
