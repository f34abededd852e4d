"""Device-mesh / sharding helpers — the scale-out substrate.

Replaces the reference's process/NCCL parallelism layer
(``/root/reference/torchrl/collectors/distributed/``, ``torchrl/_comm/``)
with GSPMD: collectors shard the env batch over a ``jax.sharding.Mesh``;
learners shard params/optimizer state; XLA inserts the collectives
(psum/all-gather over ICI/DCN).  See SURVEY.md §2.8 for the strategy map.

Axis-name conventions (used across the framework):
``dp`` data/env-batch parallel, ``fsdp`` param shard, ``tp`` tensor
parallel.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_leading_axis", "replicated", "shard_batch",
           "device_count", "P", "Mesh", "NamedSharding"]


def device_count() -> int:
    return jax.device_count()


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Create a mesh; default: all devices on one ``dp`` axis."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"dp": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)


def shard_leading_axis(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding placing the leading (env/batch) dim across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "dp", batch_dim: int = 0) -> Any:
    """Device-put every leaf with its ``batch_dim`` sharded over ``axis``."""

    def put(x):
        x = jax.numpy.asarray(x)
        spec = [None] * x.ndim
        if x.ndim > batch_dim:
            spec[batch_dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, batch)
