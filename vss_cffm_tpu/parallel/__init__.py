from .mesh import batch_sharding, create_mesh, replicate, shard_batch

__all__ = ["batch_sharding", "create_mesh", "replicate", "shard_batch"]
