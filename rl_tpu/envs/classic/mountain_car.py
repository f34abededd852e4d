"""MountainCar — native TPU implementation (discrete + continuous).

Classic control task (Moore 1990) as exposed by gym's MountainCar-v0 /
MountainCarContinuous-v0, consumed by the reference via GymEnv wrappers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Categorical, Composite, TDict
from ..base import Env

__all__ = ["MountainCarEnv", "ContinuousMountainCarEnv"]


class MountainCarEnv(Env):
    MIN_POS, MAX_POS = -1.2, 0.6
    MAX_SPEED = 0.07
    GOAL_POS = 0.5
    FORCE = 0.001
    GRAVITY = 0.0025

    def __init__(self, max_episode_steps: int = 200):
        self.max_episode_steps = int(max_episode_steps)

    @property
    def observation_spec(self) -> Composite:
        low = np.array([self.MIN_POS, -self.MAX_SPEED], np.float32)
        high = np.array([self.MAX_POS, self.MAX_SPEED], np.float32)
        return Composite(observation=Bounded(low, high, (2,)))

    def _action_spec(self):
        return Categorical(3, (), jnp.int32)

    def _reset(self, key):
        pos = jax.random.uniform(key, (1,), jnp.float32, -0.6, -0.4)
        vel = jnp.zeros((1,), jnp.float32)
        state = TDict(pos=pos, vel=vel, t=jnp.zeros((1,), jnp.int32))
        return state, TDict(observation=jnp.concatenate([pos, vel]))

    def _step(self, state, td, key):
        pos, vel = state["pos"], state["vel"]
        action = jnp.asarray(td["action"], jnp.float32).reshape((1,))
        vel = vel + (action - 1.0) * self.FORCE - jnp.cos(3 * pos) * self.GRAVITY
        vel = jnp.clip(vel, -self.MAX_SPEED, self.MAX_SPEED)
        pos = jnp.clip(pos + vel, self.MIN_POS, self.MAX_POS)
        vel = jnp.where((pos <= self.MIN_POS) & (vel < 0), 0.0, vel)
        t = state["t"] + 1
        state = TDict(pos=pos, vel=vel, t=t)
        return state, TDict(
            observation=jnp.concatenate([pos, vel]),
            reward=-jnp.ones((1,), jnp.float32),
            terminated=pos >= self.GOAL_POS,
            truncated=t >= self.max_episode_steps,
        )


class ContinuousMountainCarEnv(MountainCarEnv):
    POWER = 0.0015

    def _action_spec(self):
        return Bounded(-1.0, 1.0, (1,))

    def _step(self, state, td, key):
        pos, vel = state["pos"], state["vel"]
        force = jnp.clip(jnp.asarray(td["action"], jnp.float32).reshape((1,)), -1, 1)
        vel = vel + force * self.POWER - jnp.cos(3 * pos) * self.GRAVITY
        vel = jnp.clip(vel, -self.MAX_SPEED, self.MAX_SPEED)
        pos = jnp.clip(pos + vel, self.MIN_POS, self.MAX_POS)
        vel = jnp.where((pos <= self.MIN_POS) & (vel < 0), 0.0, vel)
        t = state["t"] + 1
        terminated = pos >= self.GOAL_POS
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        state = TDict(pos=pos, vel=vel, t=t)
        return state, TDict(
            observation=jnp.concatenate([pos, vel]),
            reward=reward,
            terminated=terminated,
            truncated=t >= self.max_episode_steps,
        )
