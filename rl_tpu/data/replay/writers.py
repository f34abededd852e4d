"""Replay writers — index allocation policies.

Counterparts of the reference writers
(``/root/reference/torchrl/data/replay_buffers/writers.py``: ``Writer`` ABC
:43, ``RoundRobinWriter`` :148, ``TensorDictMaxValueWriter`` :416,
``ImmutableDatasetWriter`` :121).  Functional: ``(wstate, n) -> (wstate,
indices)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data.tdict import TDict

__all__ = ["RoundRobinWriter", "MaxValueWriter", "ImmutableDatasetWriter", "WriterEnsemble"]


class RoundRobinWriter:
    """Ring-buffer index allocation (reference writers.py:148)."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)

    def init(self) -> TDict:
        return TDict(cursor=jnp.zeros((), jnp.int32))

    def extend(self, wstate: TDict, n: int) -> tuple[TDict, jax.Array]:
        cursor = wstate["cursor"]
        idx = (cursor + jnp.arange(n, dtype=jnp.int32)) % self.capacity
        return TDict(cursor=(cursor + n) % self.capacity), idx

    def add(self, wstate: TDict) -> tuple[TDict, jax.Array]:
        wstate, idx = self.extend(wstate, 1)
        return wstate, idx[0]


class MaxValueWriter:
    """Keep top-k items by a score key (reference writers.py:416).

    State tracks the stored scores; new items overwrite the current minimum
    only if their score is higher.  Static-shape: always produces one index
    per item, writing to a "trash" slot (capacity-1 reuse of min slot) when
    rejected — rejected items overwrite the min slot with the min's own
    values is not expressible without a second write, so we instead return
    a mask and let the buffer drop rejected items via a no-op scatter.
    """

    def __init__(self, capacity: int, rank_key=("next", "reward")):
        self.capacity = int(capacity)
        self.rank_key = rank_key

    def init(self) -> TDict:
        return TDict(
            scores=jnp.full((self.capacity,), -jnp.inf, jnp.float32),
            filled=jnp.zeros((), jnp.int32),
        )

    def extend(self, wstate: TDict, scores: jax.Array) -> tuple[TDict, jax.Array, jax.Array]:
        """Returns ``(wstate, indices, accept_mask)`` for a batch of scores.

        Items are placed sequentially: each claims the current argmin slot if
        its score beats it.  For batch writes we process via scan to keep
        exact top-k semantics.
        """
        scores = jnp.asarray(scores, jnp.float32).reshape(-1)

        def body(carry, s):
            stored = carry
            slot = jnp.argmin(stored)
            accept = s > stored[slot]
            new_stored = jnp.where(accept, stored.at[slot].set(s), stored)
            return new_stored, (slot.astype(jnp.int32), accept)

        stored, (slots, accepts) = jax.lax.scan(body, wstate["scores"], scores)
        return TDict(scores=stored, filled=wstate["filled"]), slots, accepts


class ImmutableDatasetWriter:
    """Refuses writes (offline datasets; reference writers.py:121)."""

    def __init__(self, capacity: int = 0):
        self.capacity = capacity

    def init(self) -> TDict:
        return TDict()

    def extend(self, wstate, n):
        raise RuntimeError("ImmutableDatasetWriter: dataset is read-only")

    add = extend


class WriterEnsemble:
    """One writer per sub-storage (reference writers.py:736
    ``WriterEnsemble``) — dispatches ``extend`` by ``buffer_id``."""

    def __init__(self, *writers):
        self.writers = list(writers)

    def init(self):
        return [w.init() for w in self.writers]

    def extend(self, wstate, buffer_id: int, n: int):
        wstate = list(wstate)
        wstate[buffer_id], idx = self.writers[buffer_id].extend(wstate[buffer_id], n)
        return wstate, idx

    def __getitem__(self, i):
        return self.writers[i]

    def __len__(self):
        return len(self.writers)
