from .mesh import (
    make_mesh,
    shard_leading_axis,
    replicated,
    shard_batch,
    device_count,
)

__all__ = [
    "make_mesh",
    "shard_leading_axis",
    "replicated",
    "shard_batch",
    "device_count",
]
