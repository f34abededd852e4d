"""ReplayBuffer — Storage × Sampler × Writer composition.

Counterpart of the reference composition class
(``/root/reference/torchrl/data/replay_buffers/replay_buffers.py``:
``ReplayBuffer`` :126, ``add`` :1341, ``extend`` :1457, ``sample`` :1543,
``update_priority`` :1498; ``TensorDictReplayBuffer`` :2187,
``PrioritizedReplayBuffer`` :1902).

Two layers:

* a **functional core** — ``init/extend/sample/update_priority`` over an
  explicit ``rb_state`` pytree, fully jittable, composable into a fused
  training step (device-resident replay);
* a thin **stateful wrapper** with the reference's imperative API
  (``rb.extend(data); batch = rb.sample()``) that owns the state and a PRNG
  key — convenience for scripts/tests.  An RLock guards the stateful
  wrapper (reference ``_replay_lock`` replay_buffers.py:447): a background
  collector thread extending while the learner samples must not clobber
  the other's state update.  The functional core needs no locks — state
  threading is explicit there.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from rl_tpu.data.tdict import TDict
from .samplers import PrioritizedSampler, RandomSampler
from .storages import TensorStorage
from .writers import RoundRobinWriter

__all__ = ["ReplayBuffer", "TensorDictReplayBuffer", "PrioritizedReplayBuffer"]


class ReplayBuffer:
    """Composable replay buffer (functional core + stateful sugar)."""

    def __init__(
        self,
        *,
        storage: TensorStorage | None = None,
        sampler=None,
        writer=None,
        capacity: int | None = None,
        batch_size: int | None = None,
        transform: Callable[[TDict], TDict] | None = None,
    ):
        if storage is None:
            if capacity is None:
                raise ValueError("provide storage or capacity")
            storage = TensorStorage(capacity)
        self.storage = storage
        cap = storage.capacity
        self.sampler = sampler or RandomSampler(cap)
        self.writer = writer or RoundRobinWriter(cap)
        self.batch_size = batch_size
        self.transform = transform
        self._state: TDict | None = None
        self._key = None
        import threading

        self._lock = threading.RLock()
        # cache jitted entry points: rebuilding jax.jit per call would
        # retrace every time
        self._jit_extend: Callable | None = None
        self._jit_add: Callable | None = None
        self._jit_sample: Callable | None = None
        self._jit_update_priority: Callable | None = None

    def __getstate__(self):
        # locks don't pickle; jitted entry points are per-process caches
        d = dict(self.__dict__)
        d["_lock"] = None
        for k in ("_jit_extend", "_jit_add", "_jit_sample",
                  "_jit_update_priority"):
            d[k] = None
        return d

    def __setstate__(self, d):
        import threading

        self.__dict__.update(d)
        self._lock = threading.RLock()

    # -- functional core ----------------------------------------------------
    def init(self, example: TDict) -> TDict:
        return TDict(
            storage=self.storage.init(example),
            sampler=self.sampler.init(),
            writer=self.writer.init(),
        )

    def init_from_batch(self, batch: TDict) -> TDict:
        example = jax.tree.map(lambda x: jnp.asarray(x)[0], batch)
        return self.init(example)

    def extend_fn(self, state: TDict, data: TDict) -> tuple[TDict, jax.Array]:
        """Write a [N, ...] batch; returns (state, written indices)."""
        leaves = jax.tree.leaves(data)
        n = leaves[0].shape[0]
        wstate, idx = self.writer.extend(state["writer"], n)
        sstorage = self.storage.set(state["storage"], idx, data)
        if getattr(self.sampler, "needs_extend_data", False):
            # slice samplers maintain a write-time episode table from the
            # written traj-ids/dones (reference _get_stop_and_length)
            ssampler = self.sampler.extend(state["sampler"], idx, data)
        else:
            ssampler = self.sampler.extend(state["sampler"], idx)
        return TDict(storage=sstorage, sampler=ssampler, writer=wstate), idx

    def add_fn(self, state: TDict, item: TDict) -> tuple[TDict, jax.Array]:
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], item)
        state, idx = self.extend_fn(state, batch)
        return state, idx[0]

    def sample_fn(self, state: TDict, key, batch_size: int | None = None,
                  **sampler_kwargs):
        """Returns ``(state, batch, info)``; info carries ``index`` and
        (for prioritized) ``_weight``."""
        bs = batch_size or self.batch_size
        if bs is None:
            raise ValueError("no batch_size configured")
        size = self.storage.size(state["storage"])
        if hasattr(self.sampler, "done_key"):
            # SliceSampler: pass stored done flags for boundary masking
            dones = self._stored_dones(state)
            sstate, idx, info = self.sampler.sample(
                state["sampler"], size, bs, key, dones=dones, **sampler_kwargs
            )
        else:
            sstate, idx, info = self.sampler.sample(
                state["sampler"], size, bs, key, **sampler_kwargs
            )
        batch = self.storage.get(state["storage"], idx)
        if self.transform is not None:
            batch = self.transform(batch)
        info = info.set("index", idx) if "index" not in info else info
        return state.set("sampler", sstate), batch, info

    def _stored_dones(self, state: TDict):
        sampler = self.sampler
        data = state["storage", "data"]
        key = getattr(sampler, "done_key", ("next", "done"))
        if key in data:
            return jnp.asarray(data[key]).reshape(len(self.storage), -1)[:, 0]
        return jnp.zeros((len(self.storage),), bool)

    def update_priority_fn(self, state: TDict, idx, priority) -> TDict:
        sstate = self.sampler.update_priority(state["sampler"], idx, priority)
        return state.set("sampler", sstate)

    # -- stateful sugar (reference-style imperative API) --------------------
    def seed(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def extend(self, data: TDict):
        with self._lock:
            if self._state is None:
                self._state = self.init_from_batch(data)
            if self._jit_extend is None:
                # donate the state: without donation every extend copies the WHOLE
                # storage through the jit boundary (measured 22 ms per
                # extend at 1M slots on CPU; 0.01 ms donated)
                self._jit_extend = jax.jit(self.extend_fn, donate_argnums=0)
            self._state, idx = self._jit_extend(self._state, data)
            return idx

    def add(self, item: TDict):
        with self._lock:
            if self._state is None:
                self._state = self.init(item)
            if self._jit_add is None:
                self._jit_add = jax.jit(self.add_fn, donate_argnums=0)
            self._state, idx = self._jit_add(self._state, item)
            return idx

    def sample(self, batch_size: int | None = None, return_info: bool = False):
        with self._lock:
            if self._state is None:
                raise RuntimeError("buffer is empty")
            if self._key is None:
                self.seed()
            self._key, k = jax.random.split(self._key)
            if self._jit_sample is None:
                self._jit_sample = jax.jit(
                    self.sample_fn, static_argnames=("batch_size",),
                    donate_argnums=0,
                )
            self._state, batch, info = self._jit_sample(
                self._state, k, batch_size=batch_size or self.batch_size
            )
            return (batch, info) if return_info else batch

    def update_priority(self, idx, priority):
        with self._lock:
            if self._jit_update_priority is None:
                self._jit_update_priority = jax.jit(self.update_priority_fn,
                                                    donate_argnums=0)
            self._state = self._jit_update_priority(self._state, idx, priority)

    # -- checkpointing (reference ReplayBuffer.dumps/loads + the
    # checkpointers.py hierarchy) ------------------------------------------
    def dumps(self, path: str, format: str = "flat") -> None:
        """Persist the FULL buffer — storage contents, sampler state
        (including host segment-tree priorities), writer cursor, and the
        wrapper's PRNG key — into directory ``path``.  ``format``:
        flat (.npz) | nested (.npy dir) | h5."""
        import json
        import os

        import numpy as np

        from .checkpointers import checkpointer_for

        with self._lock:
            os.makedirs(path, exist_ok=True)
            cp = checkpointer_for(format)
            meta = {"format": format,
                    "has_state": self._state is not None,
                    "has_key": self._key is not None,
                    "has_host_sampler": hasattr(self.sampler, "state_dict")}
            if self._state is not None:
                cp.save(self._state, os.path.join(path, "state" + cp.extension))
            if self._key is not None:
                np.save(os.path.join(path, "key.npy"), np.asarray(self._key))
            if meta["has_host_sampler"]:
                np.savez(os.path.join(path, "host_sampler.npz"),
                         **self.sampler.state_dict())
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)

    def loads(self, path: str) -> None:
        """Inverse of :meth:`dumps`: restores state so subsequent sampling
        continues identically (a resume test asserts bit-equality)."""
        import json
        import os

        import numpy as np

        from .checkpointers import checkpointer_for

        with self._lock:
            with open(os.path.join(path, "meta.json")) as f:
                meta = json.load(f)
            cp = checkpointer_for(meta["format"])
            if meta["has_state"]:
                st = cp.load(os.path.join(path, "state" + cp.extension))
                # leafless sections (RandomSampler's empty state, host
                # samplers' None) vanish in the flat dump — restore them
                for section, init in (("sampler", self.sampler.init),
                                      ("writer", self.writer.init)):
                    if section not in st:
                        st = st.set(section, init())
                self._state = st
            if meta["has_key"]:
                self._key = jnp.asarray(np.load(os.path.join(path, "key.npy")))
            if meta.get("has_host_sampler") and hasattr(self.sampler,
                                                        "load_state_dict"):
                with np.load(os.path.join(path, "host_sampler.npz")) as z:
                    self.sampler.load_state_dict(
                        {k: z[k] for k in z.files})

    def stats(self) -> dict:
        """Cheap scalar snapshot for LoggerMonitor (reference
        monitoring.py protocol)."""
        return {"size": len(self), "capacity": self.storage.capacity}

    def __len__(self):
        if self._state is None:
            return 0
        return int(self.storage.size(self._state["storage"]))


# The TDict layout IS the TensorDict layout — same class covers both.
TensorDictReplayBuffer = ReplayBuffer


class PrioritizedReplayBuffer(ReplayBuffer):
    """Reference replay_buffers.py:1902."""

    def __init__(self, *, capacity: int, alpha: float = 0.6, beta: float = 0.4,
                 batch_size: int | None = None, transform=None):
        super().__init__(
            storage=TensorStorage(capacity),
            sampler=PrioritizedSampler(capacity, alpha, beta),
            batch_size=batch_size,
            transform=transform,
        )
