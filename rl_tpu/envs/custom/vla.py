"""ToyVLAEnv: synthetic env speaking the canonical VLA schema.

Counterpart of ``/root/reference/torchrl/envs/custom/vla.py``
(``ToyVLAEnv`` :24): random camera image + proprioceptive state whose first
``action_dim`` entries echo the previous action; constant language
instruction (exposed as its hashed embedding index — the framework's
host-free stand-in for a string key).

Modes (matching the reference):
* echo (``success_steps=None``): reward = −‖action‖, never terminates;
* tracking (``success_steps=k``): a per-episode target action lives in
  ``state[action_dim:2·action_dim]``; reward = −‖action − target‖ and the
  episode terminates once the action stays within ``success_tol``
  (∞-norm) of the target for ``k`` consecutive steps (``success`` flag).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Binary, Bounded, Categorical, Composite, TDict, Unbounded
from rl_tpu.modules.vla import hash_instruction
from ..base import Env

__all__ = ["ToyVLAEnv"]


class ToyVLAEnv(Env):
    def __init__(self, action_dim: int = 4, state_dim: int = 8,
                 image_shape=(16, 16, 3),
                 instruction: str = "push the T-shaped block onto the target",
                 *, success_steps: int | None = None,
                 success_tol: float = 0.1, max_steps: int = 100):
        if success_steps is not None and state_dim < 2 * action_dim:
            raise ValueError("tracking mode needs state_dim >= 2*action_dim")
        if state_dim < action_dim:
            raise ValueError("state_dim must be >= action_dim")
        self.action_dim = action_dim
        self.state_dim = state_dim
        self.image_shape = tuple(image_shape)  # HWC (TPU-native)
        self.instruction = instruction
        self.instruction_idx = hash_instruction(instruction)
        self.success_steps = success_steps
        self.success_tol = success_tol
        self.max_steps = max_steps

    @property
    def observation_spec(self) -> Composite:
        return Composite(
            image=Bounded(0, 255, self.image_shape, jnp.uint8),
            state=Unbounded((self.state_dim,)),
            instruction_idx=Unbounded((1,), jnp.int32),
            success=Binary(shape=(1,)),
        )

    def _action_spec(self):
        return Bounded(-1.0, 1.0, (self.action_dim,))

    def _obs(self, state, key) -> TDict:
        image = jax.random.randint(
            key, self.image_shape, 0, 256
        ).astype(jnp.uint8)
        return TDict(
            image=image,
            state=state["state"],
            instruction_idx=jnp.full((1,), self.instruction_idx, jnp.int32),
            success=state["success"],
        )

    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        s = jnp.zeros((self.state_dim,), jnp.float32)
        if self.success_steps is not None:
            target = jax.random.uniform(
                k1, (self.action_dim,), jnp.float32, -1.0, 1.0
            )
            s = s.at[self.action_dim:2 * self.action_dim].set(target)
        state = TDict(
            state=s,
            hits=jnp.zeros((1,), jnp.int32),
            t=jnp.zeros((1,), jnp.int32),
            success=jnp.zeros((1,), bool),
        )
        return state, self._obs(state, k2)

    def _step(self, state, td, key):
        action = jnp.asarray(td["action"], jnp.float32)
        s = state["state"].at[:self.action_dim].set(action)
        if self.success_steps is not None:
            target = state["state"][self.action_dim:2 * self.action_dim]
            err = action - target
            reward = -jnp.linalg.norm(err)
            hit = jnp.max(jnp.abs(err)) <= self.success_tol
            hits = jnp.where(hit, state["hits"] + 1, 0)
            success = hits >= self.success_steps
            terminated = success
        else:
            reward = -jnp.linalg.norm(action)
            hits = state["hits"]
            success = jnp.zeros((1,), bool)
            terminated = jnp.zeros((1,), bool)
        t = state["t"] + 1
        new_state = TDict(state=s, hits=hits, t=t, success=success)
        return new_state, self._obs(new_state, key).update(TDict(
            reward=reward.reshape(1),
            terminated=terminated.reshape(1),
            truncated=(t >= self.max_steps).reshape(1),
        ))
