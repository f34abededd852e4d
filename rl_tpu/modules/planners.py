"""Sampling-based MPC planners.

Counterparts of ``/root/reference/torchrl/modules/planners/``:
``CEMPlanner`` cem.py:17, ``MPPIPlanner`` mppi.py:19 — model-predictive
control over (model-based) envs.  Fully jittable: candidate rollouts are a
``vmap`` over a ``lax.scan``; CEM refits a Gaussian to the elite set each
iteration; MPPI exponentially weights all candidates.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict, TensorSpec
from rl_tpu.envs.base import Env

__all__ = ["CEMPlanner", "MPPIPlanner"]


class _PlannerBase:
    def __init__(self, env: Env, *, planning_horizon: int, num_candidates: int,
                 action_spec: TensorSpec | None = None, action_key: str = "action"):
        self.env = env
        self.planning_horizon = int(planning_horizon)
        self.num_candidates = int(num_candidates)
        self.action_spec = action_spec if action_spec is not None else env.action_spec
        self.action_key = action_key

    def _rollout_returns(self, state, td, actions, key):
        """actions: [C, H, *act] — evaluate candidates; returns [C]."""
        C = actions.shape[0]
        rep_state = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x)[None], (C,) + jnp.asarray(x).shape),
            state,
        )
        rep_td = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x)[None], (C,) + jnp.asarray(x).shape),
            td,
        )

        def one(state_i, td_i, acts_i, k):
            def body(carry, xs):
                s, t = carry
                a, kk = xs
                t = t.set(self.action_key, a)
                s, full, root = self.env.step_and_maybe_reset(s, t, kk)
                return (s, root), full["next", "reward"]

            ks = jax.random.split(k, self.planning_horizon)
            (_, _), rewards = jax.lax.scan(body, (state_i, td_i), (acts_i, ks))
            return rewards.sum()

        ks = jax.random.split(key, C)
        return jax.vmap(one)(rep_state, rep_td, actions, ks).reshape(C)

    def plan(self, state, td: TDict, key) -> jax.Array:
        raise NotImplementedError

    def __call__(self, state, td: TDict, key) -> TDict:
        action_seq = self.plan(state, td, key)
        return td.set(self.action_key, action_seq[0])


class CEMPlanner(_PlannerBase):
    """Cross-entropy method MPC (reference cem.py:17)."""

    def __init__(self, env: Env, *, planning_horizon: int = 10,
                 optim_steps: int = 5, num_candidates: int = 64,
                 top_k: int = 8, **kwargs):
        super().__init__(env, planning_horizon=planning_horizon,
                         num_candidates=num_candidates, **kwargs)
        self.optim_steps = int(optim_steps)
        self.top_k = int(top_k)

    def plan(self, state, td: TDict, key) -> jax.Array:
        act_shape = self.action_spec.shape
        H, C = self.planning_horizon, self.num_candidates
        mean = jnp.zeros((H,) + act_shape)
        std = jnp.ones((H,) + act_shape)

        def opt_step(carry, k):
            mean, std = carry
            k_s, k_r = jax.random.split(k)
            noise = jax.random.normal(k_s, (C, H) + act_shape)
            actions = self.action_spec.project(mean[None] + std[None] * noise)
            returns = self._rollout_returns(state, td, actions, k_r)
            top = jax.lax.top_k(returns, self.top_k)[1]
            elites = actions[top]
            return (elites.mean(0), elites.std(0) + 1e-6), returns.max()

        (mean, std), _ = jax.lax.scan(
            opt_step, (mean, std), jax.random.split(key, self.optim_steps)
        )
        return self.action_spec.project(mean)


class MPPIPlanner(_PlannerBase):
    """Model-predictive path integral control (reference mppi.py:19)."""

    def __init__(self, env: Env, *, planning_horizon: int = 10,
                 num_candidates: int = 64, temperature: float = 1.0,
                 optim_steps: int = 1, **kwargs):
        super().__init__(env, planning_horizon=planning_horizon,
                         num_candidates=num_candidates, **kwargs)
        self.temperature = float(temperature)
        self.optim_steps = int(optim_steps)

    def plan(self, state, td: TDict, key) -> jax.Array:
        act_shape = self.action_spec.shape
        H, C = self.planning_horizon, self.num_candidates
        mean = jnp.zeros((H,) + act_shape)

        def opt_step(mean, k):
            k_s, k_r = jax.random.split(k)
            noise = jax.random.normal(k_s, (C, H) + act_shape)
            actions = self.action_spec.project(mean[None] + noise)
            returns = self._rollout_returns(state, td, actions, k_r)
            w = jax.nn.softmax(self.temperature * returns)
            new_mean = jnp.einsum("c,c...->...", w, actions)
            return new_mean, returns.max()

        mean, _ = jax.lax.scan(opt_step, mean, jax.random.split(key, self.optim_steps))
        return self.action_spec.project(mean)
