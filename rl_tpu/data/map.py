"""Hash-indexed TDict storage and the MCTS forest.

Counterparts of ``/root/reference/torchrl/data/map/``:
``SipHash``/``RandomProjectionHash`` hash.py:75,119, ``QueryModule``
query.py:59, ``TensorDictMap`` tdstorage.py:59, ``Tree``/``MCTSForest``
tree.py:30,682.

Host-side associative storage (python dict keyed by content hashes of
device arrays) — the control-plane side of MCTS; per-node statistics can be
arrays that flow back to the device for scoring.
"""
from __future__ import annotations

import hashlib
from typing import Any, Callable, Sequence

import numpy as np

from rl_tpu.data.tdict import TDict

__all__ = ["SipHash", "RandomProjectionHash", "QueryModule", "TensorDictMap",
           "Tree", "MCTSForest"]


class SipHash:
    """Content hash of arrays (reference hash.py:75; blake2 stands in for
    the reference's siphash — stability within a process is what matters)."""

    def __call__(self, *arrays) -> bytes:
        h = hashlib.blake2b(digest_size=16)
        for a in arrays:
            a = np.asarray(a)
            h.update(a.tobytes())
            h.update(str(a.shape).encode())
        return h.digest()


class RandomProjectionHash:
    """LSH for continuous observations (reference hash.py:119): random
    projection + sign quantization."""

    def __init__(self, dim: int, n_bits: int = 32, seed: int = 0):
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(dim, n_bits).astype(np.float32)

    def __call__(self, x) -> bytes:
        x = np.asarray(x, np.float32).reshape(-1)
        bits = (x @ self.proj) > 0
        return np.packbits(bits).tobytes()


class QueryModule:
    """Map selected TDict keys to a hash key (reference query.py:59)."""

    def __init__(self, in_keys: Sequence, hash_fn: Callable | None = None):
        self.in_keys = list(in_keys)
        self.hash_fn = hash_fn or SipHash()

    def __call__(self, td: TDict) -> bytes:
        return self.hash_fn(*[td[k] for k in self.in_keys])


class TensorDictMap:
    """Hash-indexed TDict storage (reference tdstorage.py:59)."""

    def __init__(self, query: QueryModule | Sequence | None = None):
        if query is None:
            query = QueryModule(["observation"])
        elif not isinstance(query, QueryModule):
            query = QueryModule(query)
        self.query = query
        self._store: dict[bytes, TDict] = {}

    def __setitem__(self, td: TDict, value: TDict):
        self._store[self.query(td)] = value

    def __getitem__(self, td: TDict) -> TDict:
        return self._store[self.query(td)]

    def get(self, td: TDict, default=None):
        return self._store.get(self.query(td), default)

    def __contains__(self, td: TDict) -> bool:
        return self.query(td) in self._store

    def __len__(self) -> int:
        return len(self._store)

    def update_in_place(self, td: TDict, fn: Callable[[TDict], TDict],
                        default: TDict | None = None):
        k = self.query(td)
        cur = self._store.get(k, default)
        self._store[k] = fn(cur)
        return self._store[k]


class Tree:
    """One MCTS node (reference tree.py:30): per-action statistics plus
    child links."""

    __slots__ = ("state", "n_actions", "visits", "value_sum", "prior",
                 "children", "terminal")

    def __init__(self, state: TDict, n_actions: int, prior=None,
                 terminal: bool = False):
        self.state = state
        self.n_actions = n_actions
        self.visits = np.zeros(n_actions, np.float32)
        self.value_sum = np.zeros(n_actions, np.float32)
        self.prior = np.asarray(
            prior if prior is not None else np.full(n_actions, 1.0 / n_actions),
            np.float32,
        )
        self.children: dict[int, "Tree"] = {}
        self.terminal = terminal

    @property
    def q_values(self) -> np.ndarray:
        return self.value_sum / np.maximum(self.visits, 1.0)

    @property
    def total_visits(self) -> float:
        return float(self.visits.sum())

    def update(self, action: int, value: float):
        self.visits[action] += 1
        self.value_sum[action] += value


class MCTSForest:
    """Forest of search trees keyed by state hash (reference tree.py:682).

    ``extend(state_td, ...)`` gets/creates the node for a state; roots are
    shared across searches that reach the same state (transposition table).
    """

    def __init__(self, n_actions: int, query: QueryModule | Sequence | None = None):
        self.n_actions = n_actions
        self.map = TensorDictMap(query)

    def get_node(self, state: TDict, prior=None, terminal: bool = False) -> Tree:
        node = self.map.get(state)
        if node is None:
            node = Tree(state, self.n_actions, prior, terminal)
            self.map[state] = node
        return node

    def __len__(self):
        return len(self.map)
