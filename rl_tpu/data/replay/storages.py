"""Replay storages.

TPU re-design of the reference storage hierarchy
(``/root/reference/torchrl/data/replay_buffers/storages.py``: ``Storage``
ABC :171, ``ListStorage`` :362, ``TensorStorage`` :636, ``LazyTensorStorage``
:1335, ``LazyMemmapStorage`` :1587).

``TensorStorage`` is the hot path: a preallocated TDict of ``[capacity, ...]``
arrays living in HBM (device-resident replay — sampling and writes are
scatter/gather inside jit, no host round-trips).  ``LazyMemmapStorage``
keeps the reference's disk-backed path for giant host-RAM buffers.
Functional API: state in, state out.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data.tdict import TDict

__all__ = ["TensorStorage", "LazyTensorStorage", "ListStorage", "LazyMemmapStorage"]


class TensorStorage:
    """Preallocated contiguous storage (reference storages.py:636).

    State: ``TDict(data=<[capacity,...] leaves>, size=int32)``.
    """

    def __init__(self, capacity: int):
        self.capacity = int(capacity)

    def init(self, example: TDict) -> TDict:
        """Allocate zeroed storage shaped like one example item."""
        data = jax.tree.map(
            lambda x: jnp.zeros((self.capacity,) + jnp.asarray(x).shape, jnp.asarray(x).dtype),
            example,
        )
        return TDict(data=data, size=jnp.zeros((), jnp.int32))

    def set(self, state: TDict, idx: jax.Array, items: TDict) -> TDict:
        """Scatter a batch of items at ``idx`` ([N] indices)."""
        data = jax.tree.map(lambda buf, x: buf.at[idx].set(x), state["data"], items)
        new_size = jnp.minimum(
            jnp.maximum(state["size"], jnp.max(idx).astype(jnp.int32) + 1), self.capacity
        )
        return TDict(data=data, size=new_size)

    def get(self, state: TDict, idx: jax.Array) -> TDict:
        """Gather a batch of items."""
        return jax.tree.map(lambda buf: buf[idx], state["data"])

    def size(self, state: TDict) -> jax.Array:
        return state["size"]

    def __len__(self):
        return self.capacity


class LazyTensorStorage(TensorStorage):
    """TensorStorage that infers the item structure from the first write
    (reference storages.py:1335).  With the functional API this is just
    ``init`` taking the first batch's element — kept as an alias with a
    convenience initializer."""

    def init_from_batch(self, batch: TDict) -> TDict:
        example = jax.tree.map(lambda x: jnp.asarray(x)[0], batch)
        return self.init(example)


class ListStorage:
    """Host-side list storage for non-tensor / ragged items
    (reference storages.py:362).  NOT jittable — control-plane only."""

    def __init__(self, capacity: int = 2**32):
        self.capacity = int(capacity)
        self._data: list[Any] = []

    def init(self, example=None):
        self._data = []
        return None

    def set(self, state, idx, items) -> None:
        idxs = np.atleast_1d(np.asarray(idx))
        items = items if isinstance(items, (list, tuple)) else [items]
        for i, item in zip(idxs, items):
            i = int(i)
            if i == len(self._data):
                self._data.append(item)
            elif i < len(self._data):
                self._data[i] = item
            else:
                raise IndexError(f"non-contiguous write at {i} (len {len(self._data)})")
        return state

    def get(self, state, idx):
        idxs = np.atleast_1d(np.asarray(idx))
        return [self._data[int(i)] for i in idxs]

    def size(self, state=None) -> int:
        return len(self._data)

    def __len__(self):
        return self.capacity


class LazyMemmapStorage:
    """Disk-backed numpy memmap storage for host-RAM-exceeding buffers
    (reference storages.py:1587).  Host-side: use outside jit; pairs with
    host samplers and the C++ segment tree."""

    def __init__(self, capacity: int, scratch_dir: str | None = None):
        import tempfile

        self.capacity = int(capacity)
        self.scratch_dir = scratch_dir or tempfile.mkdtemp(prefix="rl_tpu_memmap_")
        self._buffers: dict[tuple, np.memmap] | None = None
        self._size = 0

    def init(self, example: TDict):
        import os

        self._buffers = {}
        for k, v in example.items(include_nested=True, leaves_only=True):
            v = np.asarray(v)
            kk = k if isinstance(k, tuple) else (k,)
            path = os.path.join(self.scratch_dir, ".".join(kk) + ".mmap")
            self._buffers[kk] = np.memmap(
                path, dtype=v.dtype, mode="w+", shape=(self.capacity,) + v.shape
            )
        self._size = 0
        return None

    def set(self, state, idx, items: TDict):
        idxs = np.asarray(idx)
        for kk, buf in self._buffers.items():
            buf[idxs] = np.asarray(items[kk])
        self._size = min(max(self._size, int(idxs.max()) + 1), self.capacity)
        return state

    def get(self, state, idx) -> TDict:
        idxs = np.asarray(idx)
        out = TDict()
        for kk, buf in self._buffers.items():
            out = out.set(kk, jnp.asarray(buf[idxs]))
        return out

    def size(self, state=None) -> int:
        return self._size

    def __len__(self):
        return self.capacity

    def flush(self):
        for buf in (self._buffers or {}).values():
            buf.flush()
