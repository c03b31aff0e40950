from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    replicate_tree,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
    "replicate_tree",
]
