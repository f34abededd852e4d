"""Pendulum — native TPU implementation of the torque-controlled pendulum.

Counterpart of the reference's pure-torch ``PendulumEnv``
(``/root/reference/torchrl/envs/custom/pendulum.py:16``) / gym Pendulum-v1:
swing-up dynamics with quadratic angle/velocity/effort cost, 200-step
truncation, no termination.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Composite, TDict
from ..base import Env

__all__ = ["PendulumEnv"]


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class PendulumEnv(Env):
    MAX_SPEED = 8.0
    MAX_TORQUE = 2.0
    DT = 0.05
    G = 10.0
    M = 1.0
    L = 1.0

    def __init__(self, max_episode_steps: int = 200):
        self.max_episode_steps = int(max_episode_steps)

    @property
    def observation_spec(self) -> Composite:
        high = np.array([1.0, 1.0, self.MAX_SPEED], np.float32)
        return Composite(observation=Bounded(-high, high, (3,)))

    def _action_spec(self):
        return Bounded(-self.MAX_TORQUE, self.MAX_TORQUE, (1,))

    def _obs(self, th, thdot):
        return jnp.concatenate([jnp.cos(th), jnp.sin(th), thdot])

    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (1,), jnp.float32, -jnp.pi, jnp.pi)
        thdot = jax.random.uniform(k2, (1,), jnp.float32, -1.0, 1.0)
        state = TDict(th=th, thdot=thdot, t=jnp.zeros((1,), jnp.int32))
        return state, TDict(observation=self._obs(th, thdot))

    def _step(self, state, td, key):
        th, thdot = state["th"], state["thdot"]
        u = jnp.clip(
            jnp.asarray(td["action"], jnp.float32).reshape((1,)),
            -self.MAX_TORQUE,
            self.MAX_TORQUE,
        )
        cost = angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2

        newthdot = thdot + (
            3 * self.G / (2 * self.L) * jnp.sin(th) + 3.0 / (self.M * self.L**2) * u
        ) * self.DT
        newthdot = jnp.clip(newthdot, -self.MAX_SPEED, self.MAX_SPEED)
        newth = th + newthdot * self.DT

        t = state["t"] + 1
        state = TDict(th=newth, thdot=newthdot, t=t)
        return state, TDict(
            observation=self._obs(newth, newthdot),
            reward=-cost,
            terminated=jnp.zeros((1,), jnp.bool_),
            truncated=t >= self.max_episode_steps,
        )
