"""Acrobot — native TPU implementation of the two-link underactuated swing-up
(classic control, Sutton 1996; gym's Acrobot-v1 semantics: RK4 integration,
torque on the second joint, terminate when the tip exceeds one link height).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Categorical, Composite, TDict
from ..base import Env

__all__ = ["AcrobotEnv"]


class AcrobotEnv(Env):
    DT = 0.2
    L1 = L2 = 1.0
    M1 = M2 = 1.0
    LC1 = LC2 = 0.5
    I1 = I2 = 1.0
    G = 9.8
    MAX_VEL_1 = 4 * np.pi
    MAX_VEL_2 = 9 * np.pi
    TORQUES = (-1.0, 0.0, 1.0)

    def __init__(self, max_episode_steps: int = 500):
        self.max_episode_steps = int(max_episode_steps)

    @property
    def observation_spec(self) -> Composite:
        high = np.array([1, 1, 1, 1, self.MAX_VEL_1, self.MAX_VEL_2], np.float32)
        return Composite(observation=Bounded(-high, high, (6,)))

    def _action_spec(self):
        return Categorical(3, (), jnp.int32)

    def _obs(self, s):
        t1, t2, d1, d2 = s[0], s[1], s[2], s[3]
        return jnp.stack(
            [jnp.cos(t1), jnp.sin(t1), jnp.cos(t2), jnp.sin(t2), d1, d2]
        )

    def _dsdt(self, s, torque):
        m1, m2, l1, lc1, lc2, i1, i2, g = (
            self.M1, self.M2, self.L1, self.LC1, self.LC2, self.I1, self.I2, self.G
        )
        t1, t2, d1, d2 = s[0], s[1], s[2], s[3]
        d1_ = (
            m1 * lc1**2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(t2)) + i1 + i2
        )
        d2_ = m2 * (lc2**2 + l1 * lc2 * jnp.cos(t2)) + i2
        phi2 = m2 * lc2 * g * jnp.cos(t1 + t2 - np.pi / 2)
        phi1 = (
            -m2 * l1 * lc2 * d2**2 * jnp.sin(t2)
            - 2 * m2 * l1 * lc2 * d2 * d1 * jnp.sin(t2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(t1 - np.pi / 2)
            + phi2
        )
        dd2 = (
            torque + d2_ / d1_ * phi1 - m2 * l1 * lc2 * d1**2 * jnp.sin(t2) - phi2
        ) / (m2 * lc2**2 + i2 - d2_**2 / d1_)
        dd1 = -(d2_ * dd2 + phi1) / d1_
        return jnp.stack([d1, d2, dd1, dd2])

    def _rk4(self, s, torque):
        dt = self.DT
        k1 = self._dsdt(s, torque)
        k2 = self._dsdt(s + dt / 2 * k1, torque)
        k3 = self._dsdt(s + dt / 2 * k2, torque)
        k4 = self._dsdt(s + dt * k3, torque)
        return s + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def _reset(self, key):
        s = jax.random.uniform(key, (4,), jnp.float32, -0.1, 0.1)
        state = TDict(s=s, t=jnp.zeros((1,), jnp.int32))
        return state, TDict(observation=self._obs(s))

    def _step(self, state, td, key):
        action = jnp.asarray(td["action"], jnp.int32)
        torque = jnp.asarray(self.TORQUES)[action]
        s = self._rk4(state["s"], torque)
        wrap = lambda x: ((x + np.pi) % (2 * np.pi)) - np.pi
        s = jnp.stack([
            wrap(s[0]), wrap(s[1]),
            jnp.clip(s[2], -self.MAX_VEL_1, self.MAX_VEL_1),
            jnp.clip(s[3], -self.MAX_VEL_2, self.MAX_VEL_2),
        ])
        t = state["t"] + 1
        terminated = (-jnp.cos(s[0]) - jnp.cos(s[1] + s[0]) > 1.0).reshape(1)
        reward = jnp.where(terminated, 0.0, -1.0).reshape(1)
        return TDict(s=s, t=t), TDict(
            observation=self._obs(s),
            reward=reward,
            terminated=terminated,
            truncated=t >= self.max_episode_steps,
        )
