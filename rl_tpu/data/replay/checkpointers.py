"""Replay-buffer checkpointers — full ``rb.dumps`` / ``rb.loads``.

Counterpart of ``/root/reference/torchrl/data/replay_buffers/
checkpointers.py`` (``FlatStorageCheckpointer``,
``NestedStorageCheckpointer``, ``H5StorageCheckpointer``, 1-651) and of
``ReplayBuffer.dumps/loads`` (replay_buffers.py): one artifact captures the
storage contents, the sampler state (including prioritized priorities and
the host C++ segment-tree state), the writer cursor, and the stateful
wrapper's PRNG key — loading resumes sampling bit-for-bit.

Formats: ``flat`` (one compressed .npz, default), ``nested`` (a directory
of .npy files, one per leaf — mmap-friendly for huge storages), ``h5``
(single HDF5 file with chunked datasets — the reference's H5 path for
storages larger than RAM).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from rl_tpu.data.tdict import TDict

__all__ = [
    "FlatStorageCheckpointer",
    "NestedStorageCheckpointer",
    "H5StorageCheckpointer",
    "checkpointer_for",
]


def _flatten(state: TDict) -> dict[str, np.ndarray]:
    flat = {}
    for kk, v in TDict(state).items(include_nested=True, leaves_only=True):
        kk = kk if isinstance(kk, tuple) else (kk,)
        flat["/".join(kk)] = np.asarray(v)
    return flat


def _unflatten(items) -> TDict:
    out = TDict()
    for k, v in items:
        out = out.set(tuple(k.split("/")), jnp.asarray(v))
    return out


class FlatStorageCheckpointer:
    """Whole pytree in one compressed .npz (reference checkpointers.py
    ``FlatStorageCheckpointer``)."""

    extension = ".npz"

    def save(self, state: TDict, path: str) -> None:
        np.savez_compressed(path, **_flatten(state))

    def load(self, path: str) -> TDict:
        if not path.endswith(".npz"):
            path = path + ".npz"
        with np.load(path) as z:
            return _unflatten((k, z[k]) for k in z.files)


class NestedStorageCheckpointer:
    """Directory of one .npy per leaf (reference
    ``NestedStorageCheckpointer``) — leaves stay individually mmap-able."""

    extension = ""

    def save(self, state: TDict, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        keys = []
        for k, v in _flatten(state).items():
            fname = k.replace("/", "__") + ".npy"
            np.save(os.path.join(path, fname), v)
            keys.append(k)
        with open(os.path.join(path, "keys.json"), "w") as f:
            json.dump(keys, f)

    def load(self, path: str) -> TDict:
        with open(os.path.join(path, "keys.json")) as f:
            keys = json.load(f)
        return _unflatten(
            (k, np.load(os.path.join(path, k.replace("/", "__") + ".npy")))
            for k in keys
        )


class H5StorageCheckpointer:
    """Single HDF5 file with one chunked dataset per leaf (reference
    ``H5StorageCheckpointer`` — the format for storages larger than RAM)."""

    extension = ".h5"

    def __init__(self, compression: str | None = "gzip"):
        self.compression = compression

    def save(self, state: TDict, path: str) -> None:
        import h5py

        with h5py.File(path, "w") as f:
            for k, v in _flatten(state).items():
                kw: dict[str, Any] = {}
                if self.compression and v.ndim > 0 and v.size > 1024:
                    kw = dict(compression=self.compression)
                f.create_dataset(k, data=v, **kw)

    def load(self, path: str) -> TDict:
        import h5py

        if not path.endswith(".h5"):
            path = path + ".h5"
        with h5py.File(path, "r") as f:
            items = []

            def visit(name, obj):
                import h5py as _h

                if isinstance(obj, _h.Dataset):
                    items.append((name, obj[()]))

            f.visititems(visit)
            return _unflatten(items)


_BY_NAME = {
    "flat": FlatStorageCheckpointer,
    "npz": FlatStorageCheckpointer,
    "nested": NestedStorageCheckpointer,
    "h5": H5StorageCheckpointer,
}


def checkpointer_for(fmt: str):
    try:
        return _BY_NAME[fmt]()
    except KeyError:
        raise ValueError(
            f"unknown checkpoint format {fmt!r} (flat|nested|h5)") from None
