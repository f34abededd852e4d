from .mesh import (
    make_mesh,
    shard_leading_axis,
    replicated,
    shard_batch,
    device_count,
)
from .launch import free_port, global_batch, initialize_multiprocess

__all__ = [
    "make_mesh",
    "shard_leading_axis",
    "replicated",
    "shard_batch",
    "device_count",
    "initialize_multiprocess",
    "free_port",
    "global_batch",
]
