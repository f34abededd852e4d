"""Picklable env factory with metadata caching.

Counterpart of ``/root/reference/torchrl/envs/env_creator.py:1-292``
(``EnvCreator``).  Multiprocess collector workers receive a factory — not a
live env — because jitted step functions and device buffers don't cross
process boundaries.  The parent instantiates the env once to cache its
metadata (specs, batch size) so fleet composition can be validated without
paying a per-worker construction round-trip.
"""
from __future__ import annotations

from typing import Any, Callable

__all__ = ["EnvCreator", "env_creator"]


class EnvCreator:
    """Wrap ``fn(*args, **kwargs) -> Env`` into a picklable, metadata-cached
    factory.

    >>> creator = EnvCreator(lambda: TransformedEnv(PendulumEnv(), ...))
    >>> creator.action_spec        # from cached metadata, no rebuild
    >>> env = creator()            # fresh env (e.g. inside a worker)
    """

    def __init__(self, fn: Callable[..., Any], *args, **kwargs):
        self.fn = fn
        self.args = args
        self.kwargs = kwargs
        self._meta = None

    def _cache_meta(self) -> None:
        env = self.fn(*self.args, **self.kwargs)
        self._meta = {
            "batch_size": getattr(env, "batch_size", ()),
            "observation_spec": getattr(env, "observation_spec", None),
            "action_spec": getattr(env, "action_spec", None),
            "reward_spec": getattr(env, "reward_spec", None),
            "done_spec": getattr(env, "done_spec", None),
        }
        close = getattr(env, "close", None)
        if close is not None:
            close()

    @property
    def meta(self) -> dict:
        if self._meta is None:
            self._cache_meta()
        return self._meta

    @property
    def batch_size(self):
        return self.meta["batch_size"]

    @property
    def observation_spec(self):
        return self.meta["observation_spec"]

    @property
    def action_spec(self):
        return self.meta["action_spec"]

    @property
    def reward_spec(self):
        return self.meta["reward_spec"]

    @property
    def done_spec(self):
        return self.meta["done_spec"]

    def __call__(self):
        return self.fn(*self.args, **self.kwargs)

    # metadata is lazily rebuilt on the other side; don't ship spec pytrees
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_meta"] = None
        return d


def env_creator(fn: Callable[..., Any]) -> Callable[..., EnvCreator]:
    """Decorator form: ``@env_creator`` turns an env-building function into
    one returning :class:`EnvCreator` instances."""

    def make(*args, **kwargs):
        return EnvCreator(fn, *args, **kwargs)

    return make
