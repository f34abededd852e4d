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
    "SharedMemWeightSyncScheme",
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


class SharedMemWeightSyncScheme(WeightSyncScheme):
    """Cross-process weight sync over a shared-memory seqlock box
    (reference ``SharedMemWeightSyncScheme`` _shared.py:327 — a versioned
    shared-memory slot the learner overwrites in place; csrc/shm_ring.cpp
    ``box_*``).  One writer, any number of reader processes; the writer
    never blocks on slow readers and readers always see the newest
    complete version (torn reads are detected and retried by the seqlock).

    Learner side::

        scheme = SharedMemWeightSyncScheme.create("policy", n_params)
        scheme.push(params)                  # flat f32 vector -> shm

    Worker side (another process)::

        scheme = SharedMemWeightSyncScheme.attach("policy")
        params = scheme.pull(template=params)  # None if nothing new
    """

    def __init__(self, box, **kwargs):
        kwargs.setdefault("strategy", WeightStrategy(extract_as="flat"))
        super().__init__(**kwargs)
        self._box = box
        self._seen_version = 0

    @classmethod
    def create(cls, name: str, num_params: int,
               **kwargs) -> "SharedMemWeightSyncScheme":
        from rl_tpu.comm.shm_ring import SeqlockBox

        size = 4 * int(num_params) + 64  # f32 payload + array framing
        return cls(SeqlockBox.create(f"wsync_{name}", size), **kwargs)

    @classmethod
    def attach(cls, name: str, **kwargs) -> "SharedMemWeightSyncScheme":
        from rl_tpu.comm.shm_ring import SeqlockBox

        return cls(SeqlockBox.attach(f"wsync_{name}"), **kwargs)

    def push(self, params) -> None:
        import numpy as np

        flat = np.asarray(jax.device_get(self.strategy.extract(params)),
                          np.float32)
        self._box.write_array(flat)

    def pull(self, template=None, *, timeout: float = 0.0):
        """Newest pushed weights restored into ``template``'s structure, or
        None when nothing NEW (vs the last pull) arrived within
        ``timeout``."""
        import time

        deadline = time.monotonic() + timeout
        while True:
            payload, version = self._box.read_array()
            if payload is not None and version > self._seen_version:
                break
            if time.monotonic() >= deadline:
                return None
            time.sleep(0.0005)
        self._seen_version = version
        import jax.numpy as jnp

        if template is None:
            return jnp.asarray(payload)
        return self.strategy.restore(template, jnp.asarray(payload))

    @property
    def version(self) -> int:
        _, version = self._box.read_bytes()
        return version

    def close(self) -> None:
        self._box.close()
