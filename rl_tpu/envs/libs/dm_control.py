"""dm_control bridge (same host-pool + io_callback design as GymEnv).

Counterpart of the reference DMControlEnv (``/root/reference/torchrl/envs/
libs/dm_control.py``).  Observations are flattened dicts → one
``observation`` vector (the reference keeps the dict; pass
``flatten_obs=False`` for per-key observations).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Composite, TDict, Unbounded
from ..base import Env
from .gym import HostEnvPool

__all__ = ["DMControlEnv"]


class _DMAdapter:
    """Adapt a dm_env to the gym-ish API HostEnvPool expects."""

    def __init__(self, domain: str, task: str, flatten_obs: bool = True):
        from dm_control import suite

        self._env = suite.load(domain, task)
        self.flatten_obs = flatten_obs

    def _obs(self, ts):
        if self.flatten_obs:
            parts = [np.asarray(v, np.float32).reshape(-1) for v in ts.observation.values()]
            return np.concatenate(parts) if parts else np.zeros(0, np.float32)
        return {k: np.asarray(v, np.float32) for k, v in ts.observation.items()}

    def reset(self, seed=None):
        ts = self._env.reset()
        return self._obs(ts), {}

    def step(self, action):
        ts = self._env.step(np.asarray(action))
        reward = float(ts.reward or 0.0)
        terminated = ts.last() and ts.discount == 0.0
        truncated = ts.last() and not terminated
        return self._obs(ts), reward, terminated, truncated, {}

    def close(self):
        pass


class DMControlEnv(Env):
    """Batched dm_control env via the host pool."""

    host_autoreset = True

    def __init__(self, domain: str, task: str, num_envs: int = 1,
                 num_threads: int | None = None):
        self.domain, self.task = domain, task
        self.num_envs = int(num_envs)
        self.batch_size = (self.num_envs,)
        self._pool = HostEnvPool(
            [lambda: _DMAdapter(domain, task) for _ in range(num_envs)],
            num_threads=num_threads,
        )
        proto = self._pool.envs[0]
        from .spaces import dm_spec_to_spec

        obs0, _ = proto.reset()
        self._obs_shape = obs0.shape
        self._act_spec = dm_spec_to_spec(proto._env.action_spec())

    @property
    def observation_spec(self) -> Composite:
        return Composite(observation=Unbounded(self._obs_shape, jnp.float32))

    def _action_spec(self):
        return self._act_spec

    # the bridge flow is identical to GymEnv — reuse its machinery
    reset = None  # assigned below
    step = None
    step_and_maybe_reset = None
    rollout = None


# share the io_callback plumbing with GymEnv
from .gym import GymEnv as _G  # noqa: E402

DMControlEnv._seeds = _G._seeds
DMControlEnv._host_reset = _G._host_reset
DMControlEnv._host_step = _G._host_step
DMControlEnv.reset = _G.reset
DMControlEnv.step = _G.step
DMControlEnv.step_and_maybe_reset = _G.step_and_maybe_reset
DMControlEnv.rollout = _G.rollout
DMControlEnv.close = _G.close
