"""Reacher — native TPU 2-link planar arm reaching a random target.

Counterpart of the reference custom-env family
(``/root/reference/torchrl/envs/custom/``; gym Reacher-v4 semantics):
torque-controlled double link without gravity, viscous joint damping,
random target resampled each episode, reward = −(fingertip↔target
distance) − ctrl cost, 50-step truncation, no termination.

Dynamics: standard planar two-link manipulator equations
(M(q)q̈ + C(q, q̇)q̇ = τ − b·q̇) integrated semi-implicitly — the same
closed-form inertia/Coriolis terms as Acrobot but actuated at both
joints and gravity-free, matching MuJoCo Reacher's setup.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Composite, TDict, Unbounded
from ..base import Env

__all__ = ["ReacherEnv"]


class ReacherEnv(Env):
    L1 = 0.1
    L2 = 0.11
    M1 = 0.03      # link masses (MuJoCo reacher-scale)
    M2 = 0.03
    DAMPING = 0.01
    MAX_TORQUE = 1.0
    MAX_SPEED = 30.0
    DT = 0.02
    TARGET_R = 0.18  # targets sampled inside reach

    def __init__(self, max_episode_steps: int = 50):
        self.max_episode_steps = int(max_episode_steps)

    @property
    def observation_spec(self) -> Composite:
        # [cos q1, cos q2, sin q1, sin q2, target xy, qdot1, qdot2,
        #  fingertip - target xy]  (gym Reacher-v4 layout, 10-d)
        return Composite(observation=Unbounded((10,), jnp.float32))

    def _action_spec(self):
        return Bounded(-self.MAX_TORQUE, self.MAX_TORQUE, (2,))

    def _fingertip(self, q):
        x = self.L1 * jnp.cos(q[0]) + self.L2 * jnp.cos(q[0] + q[1])
        y = self.L1 * jnp.sin(q[0]) + self.L2 * jnp.sin(q[0] + q[1])
        return jnp.stack([x, y])

    def _obs(self, q, qd, target):
        tip = self._fingertip(q)
        return jnp.concatenate([
            jnp.cos(q), jnp.sin(q), target, qd, tip - target,
        ]).astype(jnp.float32)

    def _reset(self, key):
        kq, kv, kt = jax.random.split(key, 3)
        q = jax.random.uniform(kq, (2,), jnp.float32, -0.1, 0.1)
        qd = jax.random.uniform(kv, (2,), jnp.float32, -0.005, 0.005)
        # rejection-free target sample: polar with radius <= TARGET_R
        kr, ka = jax.random.split(kt)
        r = self.TARGET_R * jnp.sqrt(
            jax.random.uniform(kr, (), jnp.float32, 0.0, 1.0))
        ang = jax.random.uniform(ka, (), jnp.float32, -jnp.pi, jnp.pi)
        target = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang)])
        state = TDict(q=q, qd=qd, target=target,
                      t=jnp.zeros((1,), jnp.int32))
        return state, TDict(observation=self._obs(q, qd, target))

    def _step(self, state, td, key):
        q, qd, target = state["q"], state["qd"], state["target"]
        u = jnp.clip(jnp.asarray(td["action"], jnp.float32).reshape((2,)),
                     -self.MAX_TORQUE, self.MAX_TORQUE)

        # planar 2-link manipulator, no gravity
        m1, m2, l1, l2 = self.M1, self.M2, self.L1, self.L2
        lc1, lc2 = l1 / 2, l2 / 2
        i1 = m1 * l1 * l1 / 12.0
        i2 = m2 * l2 * l2 / 12.0
        c2 = jnp.cos(q[1])
        s2 = jnp.sin(q[1])
        h = m2 * l1 * lc2
        m11 = i1 + i2 + m1 * lc1**2 + m2 * (l1**2 + lc2**2) + 2 * h * c2
        m12 = i2 + m2 * lc2**2 + h * c2
        m22 = i2 + m2 * lc2**2
        M = jnp.array([[m11, m12], [m12, m22]])
        cor = jnp.array([
            -h * s2 * qd[1] * (2 * qd[0] + qd[1]),
            h * s2 * qd[0] ** 2,
        ])
        tau = u - self.DAMPING * qd - cor
        qdd = jnp.linalg.solve(M, tau)
        qd_new = jnp.clip(qd + qdd * self.DT, -self.MAX_SPEED,
                          self.MAX_SPEED)
        q_new = q + qd_new * self.DT

        dist = jnp.linalg.norm(self._fingertip(q_new) - target)
        reward = (-dist - 0.1 * jnp.sum(u**2)).reshape((1,))
        t = state["t"] + 1
        state = TDict(q=q_new, qd=qd_new, target=target, t=t)
        return state, TDict(
            observation=self._obs(q_new, qd_new, target),
            reward=reward,
            terminated=jnp.zeros((1,), jnp.bool_),
            truncated=t >= self.max_episode_steps,
        )
