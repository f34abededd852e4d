"""Unified checkpointing.

Counterpart of the reference checkpoint subsystem
(``/root/reference/torchrl/checkpoint/_checkpoint.py``: ``Checkpoint`` :692,
``StateDictCheckpointAdapter`` :423, ``GlobalRNGState`` :596).

TPU simplification (SURVEY §5.4): training state is ONE pytree (params /
optimizer / env+collector state / replay state / counters), checkpointed via
Orbax (async, sharded, multi-host-safe) plus a JSON metadata sidecar.
Components register by name; each contributes a pytree (arrays) and/or
JSON-able metadata.
"""
from __future__ import annotations

import json
import os
import random
from typing import Any, Callable

import jax
import numpy as np

from rl_tpu.data.tdict import TDict

__all__ = ["Checkpoint", "GlobalRNGState", "save_pytree", "load_pytree"]


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_pytree(path: str, tree: Any) -> None:
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree(path: str, target: Any | None = None) -> Any:
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            target = jax.tree.map(np.asarray, target)
        return ckptr.restore(path, target)


class GlobalRNGState:
    """Capture/restore python + numpy RNG (reference :596).  JAX keys are
    data — they live inside the state pytree and need no special capture."""

    @staticmethod
    def capture() -> dict:
        np_state = np.random.get_state()
        return {
            "python": random.getstate(),
            "numpy": (np_state[0], np_state[1].tolist(), *np_state[2:]),
        }

    @staticmethod
    def restore(state: dict) -> None:
        py = state["python"]
        random.setstate((py[0], tuple(py[1]), py[2]))
        n = state["numpy"]
        np.random.set_state((n[0], np.asarray(n[1], dtype=np.uint32), *n[2:]))


class Checkpoint:
    """Named-component checkpoint registry (reference :692).

    Components register either a live pytree provider or static metadata::

        ckpt = Checkpoint()
        ckpt.register("train_state", get=lambda: state, set=assign_fn)
        ckpt.register_metadata("config", cfg_dict)
        ckpt.save(path)
        ckpt.load(path)     # calls each component's `set`
    """

    def __init__(self, version: int = 1):
        self.version = version
        self._components: dict[str, tuple[Callable, Callable | None]] = {}
        self._metadata: dict[str, Any] = {}

    def register(self, name: str, get: Callable[[], Any], set: Callable[[Any], None] | None = None):
        self._components[name] = (get, set)
        return self

    def register_metadata(self, name: str, value: Any):
        self._metadata[name] = value
        return self

    def save(self, path: str) -> None:
        path = os.path.abspath(path)
        os.makedirs(path, exist_ok=True)
        tree = {name: get() for name, (get, _) in self._components.items()}
        save_pytree(os.path.join(path, "state"), tree)
        meta = {
            "version": self.version,
            "components": list(self._components),
            "rng": GlobalRNGState.capture(),
            "metadata": self._metadata,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)

    def load(self, path: str, restore_rng: bool = True) -> dict:
        path = os.path.abspath(path)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        target = {name: get() for name, (get, _) in self._components.items()}
        tree = load_pytree(os.path.join(path, "state"), target)
        for name, (_, setter) in self._components.items():
            if setter is not None and name in tree:
                setter(tree[name])
        if restore_rng and "rng" in meta:
            try:
                GlobalRNGState.restore(meta["rng"])
            except Exception:
                pass  # rng restore is best-effort across versions
        return tree
