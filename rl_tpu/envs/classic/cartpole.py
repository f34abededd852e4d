"""CartPole — native TPU implementation of the classic control task.

Functional equivalent of gym's CartPole-v1 as consumed by the reference via
``GymEnv`` (reference torchrl/envs/libs/gym.py); standard cart-pole dynamics
(Barto, Sutton & Anderson 1983) with Euler integration, 12-degree /
2.4-position termination, +1 per-step reward, 500-step truncation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Categorical, Composite, TDict, Unbounded
from ..base import Env

__all__ = ["CartPoleEnv"]


class CartPoleEnv(Env):
    GRAVITY = 9.8
    MASS_CART = 1.0
    MASS_POLE = 0.1
    HALF_LENGTH = 0.5
    FORCE_MAG = 10.0
    TAU = 0.02
    THETA_LIMIT = 12 * 2 * np.pi / 360
    X_LIMIT = 2.4

    def __init__(self, max_episode_steps: int = 500):
        self.max_episode_steps = int(max_episode_steps)

    @property
    def observation_spec(self) -> Composite:
        high = np.array(
            [self.X_LIMIT * 2, np.finfo(np.float32).max / 2,
             self.THETA_LIMIT * 2, np.finfo(np.float32).max / 2],
            np.float32,
        )
        return Composite(observation=Bounded(-high, high, (4,)))

    def _action_spec(self):
        return Categorical(2, (), jnp.int32)

    def _reset(self, key):
        obs = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        state = TDict(obs=obs, t=jnp.zeros((1,), jnp.int32))
        return state, TDict(observation=obs)

    def _step(self, state, td, key):
        x, x_dot, theta, theta_dot = jnp.split(state["obs"], 4)
        action = jnp.asarray(td["action"])
        force = jnp.where(action > 0, self.FORCE_MAG, -self.FORCE_MAG).reshape(x.shape)

        total_mass = self.MASS_CART + self.MASS_POLE
        polemass_length = self.MASS_POLE * self.HALF_LENGTH
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        temp = (force + polemass_length * theta_dot**2 * sin_t) / total_mass
        theta_acc = (self.GRAVITY * sin_t - cos_t * temp) / (
            self.HALF_LENGTH * (4.0 / 3.0 - self.MASS_POLE * cos_t**2 / total_mass)
        )
        x_acc = temp - polemass_length * theta_acc * cos_t / total_mass

        x = x + self.TAU * x_dot
        x_dot = x_dot + self.TAU * x_acc
        theta = theta + self.TAU * theta_dot
        theta_dot = theta_dot + self.TAU * theta_acc
        obs = jnp.concatenate([x, x_dot, theta, theta_dot])

        t = state["t"] + 1
        terminated = (
            (jnp.abs(x) > self.X_LIMIT) | (jnp.abs(theta) > self.THETA_LIMIT)
        )
        truncated = t >= self.max_episode_steps
        return TDict(obs=obs, t=t), TDict(
            observation=obs,
            reward=jnp.ones((1,), jnp.float32),
            terminated=terminated,
            truncated=truncated,
        )
