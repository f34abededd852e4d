"""Batched environments: ``vmap`` replaces process pools.

The reference runs N sub-envs as one batched env either in-process
(``SerialEnv`` batched_envs.py:1433) or one-process-per-env with shared-memory
buffers (``ParallelEnv`` :1805, worker loop :3107).  On TPU both collapse to
``jax.vmap`` over a pure env — the entire batch steps in lockstep in one
fused XLA program; "workers" and pipes disappear.  Multi-host scale-out
shards the batch dim over a device mesh (see rl_tpu.parallel) instead of
spawning processes.
"""
from __future__ import annotations

from typing import Any

import jax

from rl_tpu.data import Composite, TDict
from .base import Env

__all__ = ["BatchedEnv", "SerialEnv", "ParallelEnv"]


class BatchedEnv(Env):
    """N lockstep copies of ``env`` with a leading batch dim.

    All sub-envs share static config but have independent state/PRNG streams
    (reference semantics: distinct seeds per worker, batched_envs.py:3214).
    """

    def __init__(self, env: Env, num_envs: int):
        if env.batch_size:
            raise ValueError("BatchedEnv expects an unbatched inner env")
        self.env = env
        self.num_envs = int(num_envs)
        self.batch_size = (self.num_envs,)

    # -- specs: per-element (batch dim carried by self.batch_size) ----------
    @property
    def observation_spec(self) -> Composite:
        return self.env.observation_spec

    @property
    def full_action_spec(self) -> Composite:
        return self.env.full_action_spec

    @property
    def reward_spec(self):
        return self.env.reward_spec

    @property
    def full_reward_spec(self) -> Composite:
        return self.env.full_reward_spec

    @property
    def full_done_spec(self) -> Composite:
        return self.env.full_done_spec

    @property
    def state_spec(self) -> Composite:
        return self.env.state_spec

    # -- vmapped dynamics ----------------------------------------------------
    def _reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env._reset)(keys)

    def _step(self, state: Any, td: TDict, key: jax.Array):
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env._step)(state, td, keys)

    def __repr__(self) -> str:
        return f"BatchedEnv({self.env!r}, num_envs={self.num_envs})"


# On TPU there is no serial/parallel distinction — both are the same fused
# vmap program.  The names are kept for reference parity (SerialEnv
# batched_envs.py:1433, ParallelEnv :1805).
SerialEnv = BatchedEnv
ParallelEnv = BatchedEnv
