"""Deterministic mock envs — the backbone of the test suite.

Ports of the reference mocking classes
(``/root/reference/torchrl/testing/mocking_classes.py``): ``CountingEnv``
(:1168 — observation equals the step count, terminates at max), nested and
multi-key variants (:1492, :1992), and the matching count policy (:1142).
Correctness of collectors/transforms is asserted as exact integer arithmetic
on the counters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Bounded, Categorical, Composite, TDict, Unbounded
from .base import Env

__all__ = [
    "CountingEnv",
    "NestedCountingEnv",
    "MultiKeyCountingEnv",
    "CountingEnvCountPolicy",
    "ContinuousActionTestEnv",
]


class CountingEnv(Env):
    """observation == number of completed steps; terminates at ``max_steps``.

    Stepping increments the count by 1 when ``action > 0`` (reference
    mocking_classes.py:1168: action-gated increment).
    """

    def __init__(self, max_steps: int = 5, start_val: int = 0):
        self.max_steps = int(max_steps)
        self.start_val = int(start_val)

    @property
    def observation_spec(self) -> Composite:
        return Composite(observation=Unbounded((1,), jnp.float32))

    def _action_spec(self):
        return Categorical(2, (), jnp.int32)

    def _reset(self, key):
        count = jnp.full((1,), self.start_val, jnp.int32)
        state = TDict(count=count)
        return state, TDict(observation=count.astype(jnp.float32))

    def _step(self, state, td, key):
        inc = (jnp.asarray(td["action"]) > 0).astype(jnp.int32)
        count = state["count"] + inc.reshape(state["count"].shape)
        state = state.set("count", count)
        done = count >= self.max_steps
        return state, TDict(
            observation=count.astype(jnp.float32),
            reward=count.astype(jnp.float32),
            terminated=done,
        )


class NestedCountingEnv(CountingEnv):
    """Counting env with observations under a nested ``("data", ...)`` key
    (reference mocking_classes.py:1492)."""

    @property
    def observation_spec(self) -> Composite:
        return Composite({("data", "states"): Unbounded((1,), jnp.float32)})

    def _reset(self, key):
        state, td = super()._reset(key)
        return state, TDict({("data", "states"): td["observation"]})

    def _step(self, state, td, key):
        state, step_td = super()._step(state, td, key)
        return state, TDict(
            {("data", "states"): step_td["observation"]},
            reward=step_td["reward"],
            terminated=step_td["terminated"],
        )


class MultiKeyCountingEnv(CountingEnv):
    """Counting env with several observation keys of different shapes/dtypes
    (reference mocking_classes.py:1992)."""

    @property
    def observation_spec(self) -> Composite:
        return Composite(
            observation=Unbounded((1,), jnp.float32),
            observation_int=Unbounded((1,), jnp.int32),
            nested={"obs": Unbounded((2, 2), jnp.float32)},
        )

    def _reset(self, key):
        state, td = super()._reset(key)
        c = td["observation"]
        return state, TDict(
            observation=c,
            observation_int=c.astype(jnp.int32),
            nested={"obs": jnp.broadcast_to(c[..., None], c.shape[:-1] + (2, 2))},
        )

    def _step(self, state, td, key):
        state, step_td = super()._step(state, td, key)
        c = step_td["observation"]
        return state, TDict(
            observation=c,
            observation_int=c.astype(jnp.int32),
            nested={"obs": jnp.broadcast_to(c[..., None], c.shape[:-1] + (2, 2))},
            reward=step_td["reward"],
            terminated=step_td["terminated"],
        )


def CountingEnvCountPolicy(td: TDict, key=None) -> TDict:
    """Always increment (reference mocking_classes.py:1142)."""
    obs = td.get("observation", td.get(("data", "states"), None))
    shape = jnp.asarray(obs).shape[:-1] if obs is not None else ()
    return td.set("action", jnp.ones(shape, jnp.int32))


class ContinuousActionTestEnv(Env):
    """Tiny continuous-action env for actor/critic plumbing tests."""

    def __init__(self, obs_dim: int = 3, act_dim: int = 2, max_steps: int = 10):
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.max_steps = max_steps

    @property
    def observation_spec(self) -> Composite:
        return Composite(observation=Unbounded((self.obs_dim,), jnp.float32))

    def _action_spec(self):
        return Bounded(-1.0, 1.0, (self.act_dim,))

    def _reset(self, key):
        obs = jax.random.normal(key, (self.obs_dim,))
        state = TDict(obs=obs, t=jnp.zeros((1,), jnp.int32))
        return state, TDict(observation=obs)

    def _step(self, state, td, key):
        act = jnp.asarray(td["action"])
        obs = state["obs"] * 0.9 + jnp.pad(act, (0, self.obs_dim - self.act_dim)) * 0.1
        t = state["t"] + 1
        state = TDict(obs=obs, t=t)
        reward = -jnp.sum(obs**2, keepdims=True)
        return state, TDict(
            observation=obs,
            reward=reward,
            terminated=jnp.zeros((1,), jnp.bool_),
            truncated=t >= self.max_steps,
        )
