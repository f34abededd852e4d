"""Trajectory metadata + predicate query DSL.

Counterpart of the reference trajectory query layer
(``/root/reference/torchrl/data/replay_buffers/query.py``: ``Trajectory``
tensorclass :29, predicate DSL :157) — select stored trajectories by
conditions over their summary statistics ("return > 100 and length < 200").

TPU design: predicates compile to boolean masks over dense per-trajectory
metadata arrays — a single fused elementwise program under jit, no Python
row loop.  ``trajectory_metadata`` derives the stats from a padded
``[B, T]`` trajectory batch (the output of ``split_trajectories``).
"""
from __future__ import annotations

import operator

import jax.numpy as jnp

from rl_tpu.data.tdict import TDict

__all__ = ["field", "Predicate", "trajectory_metadata", "query_trajectories"]


class Predicate:
    """A composable condition over trajectory-metadata fields.

    Built via :func:`field` and python operators::

        q = (field("episode_return") > 100) & (field("length") >= 10)
        idx = query_trajectories(meta, q)
    """

    def __init__(self, fn):
        self._fn = fn

    def __call__(self, meta: TDict):
        return self._fn(meta)

    def __and__(self, other):
        return Predicate(lambda m: self(m) & other(m))

    def __or__(self, other):
        return Predicate(lambda m: self(m) | other(m))

    def __invert__(self):
        return Predicate(lambda m: ~self(m))


class _Field:
    def __init__(self, key):
        self.key = key

    def _cmp(self, op, other):
        key = self.key
        if isinstance(other, _Field):
            return Predicate(lambda m: op(jnp.asarray(m[key]),
                                          jnp.asarray(m[other.key])))
        return Predicate(lambda m: op(jnp.asarray(m[key]), other))

    def __gt__(self, o):
        return self._cmp(operator.gt, o)

    def __ge__(self, o):
        return self._cmp(operator.ge, o)

    def __lt__(self, o):
        return self._cmp(operator.lt, o)

    def __le__(self, o):
        return self._cmp(operator.le, o)

    def __eq__(self, o):  # noqa: D105
        return self._cmp(operator.eq, o)

    def __ne__(self, o):
        return self._cmp(operator.ne, o)

    __hash__ = None


def field(key) -> _Field:
    """Reference query.py:157 — name a metadata column in a predicate."""
    return _Field(key)


def trajectory_metadata(trajs: TDict, mask_key="mask",
                        reward_key=("next", "reward")) -> TDict:
    """Summary statistics per padded trajectory row.

    ``trajs``: [B, T, ...] output of ``split_trajectories`` with a boolean
    ``mask`` marking real steps.  Returns a TDict of [B] columns: ``length``,
    ``episode_return``, ``mean_reward``, ``terminated`` (any terminal step).
    """
    mask = jnp.asarray(trajs[mask_key]) if mask_key in trajs else None
    r = jnp.asarray(trajs[reward_key])
    r = r.reshape(r.shape[0], r.shape[1], -1).sum(-1)
    if mask is None:
        mask = jnp.ones(r.shape, bool)
    mask = mask.reshape(mask.shape[0], mask.shape[1], -1)[..., 0]
    length = mask.sum(-1).astype(jnp.int32)
    ret = jnp.where(mask, r, 0.0).sum(-1)
    meta = TDict(
        length=length,
        episode_return=ret,
        mean_reward=ret / jnp.maximum(length, 1),
    )
    for tkey in (("next", "terminated"), ("next", "done")):
        if tkey in trajs:
            t = jnp.asarray(trajs[tkey])
            t = t.reshape(t.shape[0], t.shape[1], -1)[..., 0]
            meta = meta.set("terminated", jnp.any(t & mask, axis=-1))
            break
    return meta


def query_trajectories(meta: TDict, predicate: Predicate):
    """Indices of trajectories satisfying ``predicate`` (host-side
    materialization of the mask — selection output is inherently dynamic)."""
    mask = predicate(meta)
    return jnp.nonzero(mask)[0]
