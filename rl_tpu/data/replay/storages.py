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

__all__ = [
    "TensorStorage",
    "LazyTensorStorage",
    "ListStorage",
    "LazyMemmapStorage",
    "LazyStackStorage",
    "CompressedListStorage",
    "StorageEnsemble",
    "StoreStorage",
    "save_storage",
    "load_storage",
]


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


class LazyStackStorage(ListStorage):
    """Host list storage whose ``get`` pad-stacks ragged TDict items into one
    dense batch + mask (reference storages.py:563 ``LazyStackStorage`` — the
    lazy-stacked TensorDict path).  TPU design: ragged data must become
    padded-dense before it can touch the device, so stacking IS padding."""

    def get(self, state, idx):
        items = super().get(state, idx)
        if not items:
            return TDict()
        if not isinstance(items[0], (dict, TDict)):
            return _pad_stack_arrays([np.asarray(x) for x in items])
        keys = list(TDict(items[0]).items(include_nested=True, leaves_only=True))
        out = TDict()
        for kk, _ in keys:
            kk = kk if isinstance(kk, tuple) else (kk,)
            arrs = [np.asarray(TDict(it)[kk]) for it in items]
            stacked, mask = _pad_stack_arrays(arrs, with_mask=True)
            out = out.set(kk, jnp.asarray(stacked))
            if mask is not None:
                out = out.set(kk[:-1] + ("masks", kk[-1]), jnp.asarray(mask))
        return out


def _pad_stack_arrays(arrs, with_mask: bool = False):
    """Right-pad a list of ndarrays to a common shape and stack."""
    shapes = np.array([a.shape for a in arrs]) if arrs[0].ndim else None
    if shapes is None or (shapes == shapes[0]).all():
        out = np.stack(arrs)
        return (out, None) if with_mask else out
    target = shapes.max(axis=0)
    out = np.zeros((len(arrs), *target), dtype=arrs[0].dtype)
    mask = np.zeros((len(arrs), *target), dtype=bool)
    for i, a in enumerate(arrs):
        sl = (i,) + tuple(slice(0, s) for s in a.shape)
        out[sl] = a
        mask[sl] = True
    return (out, mask) if with_mask else out


class CompressedListStorage(ListStorage):
    """Host list storage compressing each item with zlib (reference
    storages.py:1953 ``CompressedListStorage`` — cold replay in host RAM at
    a fraction of the footprint; decompression on sample).  Leaves are
    compressed individually so gets can stay partial."""

    def __init__(self, capacity: int = 2**32, level: int = 1):
        super().__init__(capacity)
        self.level = int(level)

    def _compress(self, item):
        import zlib

        td = TDict(item) if isinstance(item, (dict, TDict)) else None
        if td is None:
            a = np.ascontiguousarray(np.asarray(item))
            return ("__leaf__", a.dtype.str, a.shape, zlib.compress(a.tobytes(), self.level))
        packed = {}
        for kk, v in td.items(include_nested=True, leaves_only=True):
            kk = kk if isinstance(kk, tuple) else (kk,)
            a = np.ascontiguousarray(np.asarray(v))
            packed[kk] = (a.dtype.str, a.shape, zlib.compress(a.tobytes(), self.level))
        return packed

    def _decompress(self, packed):
        import zlib

        if isinstance(packed, tuple) and packed and packed[0] == "__leaf__":
            _, dt, shape, blob = packed
            return np.frombuffer(zlib.decompress(blob), dtype=np.dtype(dt)).reshape(shape)
        out = TDict()
        for kk, (dt, shape, blob) in packed.items():
            a = np.frombuffer(zlib.decompress(blob), dtype=np.dtype(dt)).reshape(shape)
            out = out.set(kk, jnp.asarray(a))
        return out

    def set(self, state, idx, items):
        items = items if isinstance(items, (list, tuple)) else [items]
        return super().set(state, idx, [self._compress(it) for it in items])

    def get(self, state, idx):
        return [self._decompress(p) for p in super().get(state, idx)]

    def bytes(self) -> int:
        """Compressed footprint in bytes (reference exposes memory stats)."""
        total = 0
        for packed in self._data:
            vals = [packed[3]] if isinstance(packed, tuple) else [
                v[2] for v in packed.values()
            ]
            total += sum(len(b) for b in vals)
        return total


class StorageEnsemble:
    """A tuple of storages addressed by ``(buffer_id, idx)`` (reference
    storages.py:2266 ``StorageEnsemble``).  Host-level composition used by
    ``ReplayBufferEnsemble``; sub-storages may be heterogeneous."""

    def __init__(self, *storages, transforms=None):
        self.storages = list(storages)
        self.transforms = transforms or [None] * len(self.storages)
        self.capacity = sum(getattr(s, "capacity", 0) for s in self.storages)

    def init(self, examples):
        return [s.init(ex) for s, ex in zip(self.storages, examples)]

    def set(self, state, buffer_id: int, idx, items):
        state = list(state)
        state[buffer_id] = self.storages[buffer_id].set(state[buffer_id], idx, items)
        return state

    def get(self, state, buffer_id: int, idx):
        out = self.storages[buffer_id].get(state[buffer_id], idx)
        t = self.transforms[buffer_id]
        return t(out) if t is not None else out

    def size(self, state):
        return [s.size(st) for s, st in zip(self.storages, state)]

    def __getitem__(self, i):
        return self.storages[i]

    def __len__(self):
        return len(self.storages)


# -- storage checkpointers (reference replay_buffers/checkpointers.py) -------

def save_storage(state: TDict, path: str) -> None:
    """Flat-layout storage checkpoint (reference ``FlatStorageCheckpointer``
    checkpointers.py:1-651): every leaf of the storage state dumped into one
    ``.npz`` keyed by '/'-joined nested keys."""
    flat = {}
    for kk, v in TDict(state).items(include_nested=True, leaves_only=True):
        kk = kk if isinstance(kk, tuple) else (kk,)
        flat["/".join(kk)] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_storage(path: str) -> TDict:
    """Inverse of :func:`save_storage`."""
    out = TDict()
    with np.load(path) as z:
        for k in z.files:
            out = out.set(tuple(k.split("/")), jnp.asarray(z[k]))
    return out


class _MemoryStore:
    """In-process dict with the tiny subset of the redis wire API StoreStorage
    needs (``set``/``get``/``delete``/``exists``)."""

    def __init__(self):
        self._d: dict[bytes, bytes] = {}

    def set(self, k, v):
        self._d[k if isinstance(k, bytes) else k.encode()] = v

    def get(self, k):
        return self._d.get(k if isinstance(k, bytes) else k.encode())

    def delete(self, *ks):
        for k in ks:
            self._d.pop(k if isinstance(k, bytes) else k.encode(), None)

    def exists(self, k):
        return (k if isinstance(k, bytes) else k.encode()) in self._d


class StoreStorage:
    """Replay storage backed by a key-value store (reference
    storages.py:2418 — redis/dragonfly via TensorDictStore).

    Each element is serialized (key-flattened npz bytes) under
    ``<prefix>:<index>``.  ``backend="memory"`` (default) runs in-process;
    ``backend="redis"`` connects through the ``redis`` package when
    installed; any client object exposing ``set/get/delete/exists`` can be
    injected via ``client=`` (so Redis-wire-compatible servers work without
    a hard dependency).  Host-side control-plane storage — not jittable.
    """

    def __init__(self, capacity: int, *, backend: str = "memory",
                 host: str = "localhost", port: int = 6379, db: int = 0,
                 prefix: str = "rl_tpu_rb", client=None):
        self.capacity = int(capacity)
        self.prefix = prefix
        if client is not None:
            self._client = client
        elif backend == "memory":
            self._client = _MemoryStore()
        elif backend in ("redis", "dragonfly", "keydb"):
            try:
                import redis
            except ImportError as e:  # pragma: no cover - redis not in image
                raise ImportError(
                    f"backend={backend!r} needs the `redis` package; pass "
                    "client= or use backend='memory'") from e
            self._client = redis.Redis(host=host, port=port, db=db)
        else:
            raise ValueError(f"unknown backend {backend!r}")
        self._size = 0

    def init(self, example=None):
        self._size = 0
        return None

    def _key(self, i: int) -> str:
        return f"{self.prefix}:{int(i)}"

    @staticmethod
    def _encode(td: TDict) -> bytes:
        import io

        buf = io.BytesIO()
        arrays = {}
        for k in td.keys(include_nested=True, leaves_only=True):
            flat = k if isinstance(k, str) else "//".join(k)
            arrays[flat] = np.asarray(td[k])
        np.savez(buf, **arrays)
        return buf.getvalue()

    @staticmethod
    def _decode(raw: bytes) -> TDict:
        import io

        with np.load(io.BytesIO(raw)) as z:
            td = TDict()
            for flat in z.files:
                k = tuple(flat.split("//")) if "//" in flat else flat
                td = td.set(k, z[flat])
        return td

    def set(self, state, idx, items):
        idxs = np.atleast_1d(np.asarray(idx))
        if isinstance(items, TDict) and len(idxs) > 1:
            items = [items[i] for i in range(len(idxs))]
        elif isinstance(items, TDict):
            items = [items] if idxs.shape[0] == 1 else [items]
        for i, item in zip(idxs, items):
            if not self._client.exists(self._key(int(i))):
                self._size += 1
            self._client.set(self._key(int(i)), self._encode(item))
        return state

    def get(self, state, idx):
        idxs = np.atleast_1d(np.asarray(idx))
        out = []
        for i in idxs:
            raw = self._client.get(self._key(int(i)))
            if raw is None:
                raise IndexError(f"no element at {int(i)}")
            out.append(self._decode(raw))
        if len(out) == 1 and np.ndim(idx) == 0:
            return out[0]
        return TDict.stack(out)

    def size(self, state=None) -> int:
        return self._size

    def __len__(self):
        return self.capacity
