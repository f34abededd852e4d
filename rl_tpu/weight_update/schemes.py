"""Weight synchronization schemes.

Counterpart of ``/root/reference/torchrl/weight_update/``:
``WeightSyncScheme`` ABC weight_sync_schemes.py:346, ``WeightStrategy`` :145,
``SharedMemWeightSyncScheme`` _shared.py:327, ``MultiProcessWeightSyncScheme``
_mp.py:18, ``DistributedWeightSyncScheme`` _distributed.py:36,
``NoWeightSyncScheme`` _noupdate.py:13.

On TPU the data plane is radically simpler than the reference's NCCL/pipe
zoo: learner and collectors share params as device arrays, so "sync" is
``jax.device_put`` with a sharding (zero-copy when already placed) or simply
passing the new pytree into the next jitted call.  The scheme classes keep
the reference's API shape so trainers/collectors stay source-compatible;
cross-host DCN broadcast arrives with ``jax.distributed`` multi-host
runtimes (same `device_put` call — GSPMD inserts the transfer).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable

import jax

__all__ = [
    "WeightStrategy",
    "WeightSyncScheme",
    "DeviceWeightSyncScheme",
    "NoWeightSyncScheme",
    "MultiProcessWeightSyncScheme",
]


class WeightStrategy:
    """Format converter (reference :145): 'pytree' (native) or 'flat'
    (single contiguous vector — the wire format for host transports)."""

    def __init__(self, extract_as: str = "pytree"):
        self.extract_as = extract_as

    def extract(self, params):
        if self.extract_as == "pytree":
            return params
        leaves = jax.tree.leaves(params)
        import jax.numpy as jnp

        return jnp.concatenate([jnp.ravel(l) for l in leaves])

    def restore(self, template, payload):
        if self.extract_as == "pytree":
            return payload
        import jax.numpy as jnp

        leaves, treedef = jax.tree.flatten(template)
        out = []
        offset = 0
        for l in leaves:
            n = l.size
            out.append(payload[offset:offset + n].reshape(l.shape).astype(l.dtype))
            offset += n
        return jax.tree.unflatten(treedef, out)


class WeightSyncScheme:
    """Base: connect a source (learner) to sinks (collectors)."""

    def __init__(self, strategy: WeightStrategy | None = None):
        self.strategy = strategy or WeightStrategy()

    def push(self, params) -> None:
        raise NotImplementedError

    def pull(self, template=None):
        raise NotImplementedError


class NoWeightSyncScheme(WeightSyncScheme):
    """Reference _noupdate.py:13 — sinks keep their initial weights."""

    def push(self, params) -> None:
        pass

    def pull(self, template=None):
        return None


class DeviceWeightSyncScheme(WeightSyncScheme):
    """Device-resident sync: place params with a target sharding (replicated
    across the collector mesh by default).  This is the TPU-native
    "SharedMem" — HBM is the shared memory."""

    def __init__(self, sharding=None, **kwargs):
        super().__init__(**kwargs)
        self.sharding = sharding
        self._latest = None
        self._version = 0

    def push(self, params) -> None:
        if self.sharding is not None:
            params = jax.device_put(params, self.sharding)
        self._latest = params
        self._version += 1

    def pull(self, template=None):
        return self._latest

    @property
    def version(self) -> int:
        return self._version


class MultiProcessWeightSyncScheme(WeightSyncScheme):
    """Queue-based sync for host worker threads/processes driving external
    envs (reference _mp.py:18).  In-process implementation uses a
    thread-safe queue; the payload is host numpy (flat strategy
    recommended)."""

    def __init__(self, maxsize: int = 1, **kwargs):
        super().__init__(**kwargs)
        self._q: queue.Queue = queue.Queue(maxsize=maxsize)
        self._lock = threading.Lock()
        self._latest = None

    def push(self, params) -> None:
        payload = jax.tree.map(lambda x: jax.device_get(x), self.strategy.extract(params))
        with self._lock:
            self._latest = payload
        try:
            self._q.put_nowait(payload)
        except queue.Full:
            try:
                self._q.get_nowait()
            except queue.Empty:
                pass
            self._q.put_nowait(payload)

    def pull(self, template=None, block: bool = False):
        if block:
            payload = self._q.get()
        else:
            with self._lock:
                payload = self._latest
        if payload is None:
            return None
        return self.strategy.restore(template, payload) if template is not None else payload
