"""Model-based environments — envs whose dynamics are a learned model.

Counterpart of ``/root/reference/torchrl/envs/model_based/common.py:17``
(``ModelBasedEnvBase``) and ``dreamer.py:17`` (``DreamerEnv``): a world
model ``(params, td_with_action, key) -> next_td`` is wrapped as an Env so
planners/policies interact with imagination exactly like with a real env.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict, TensorSpec
from .base import Env

__all__ = ["ModelBasedEnv"]


class ModelBasedEnv(Env):
    """Wrap a world model as an Env.

    ``world_model(params, state, td, key) -> (state, step_td)`` where
    step_td carries observation keys + reward (+ optionally terminated).
    ``prior(params, key) -> (state, obs_td)`` seeds imagination (e.g. from a
    replay sample or a learned prior).
    """

    def __init__(
        self,
        world_model: Callable,
        prior: Callable,
        *,
        params: Any = None,
        observation_spec: Composite,
        action_spec: TensorSpec,
        batch_size: tuple = (),
    ):
        self.world_model = world_model
        self.prior = prior
        self.params = params
        self._observation_spec = observation_spec
        self._action_leaf_spec = action_spec
        self.batch_size = batch_size

    @property
    def observation_spec(self) -> Composite:
        return self._observation_spec

    def _action_spec(self):
        return self._action_leaf_spec

    def _reset(self, key):
        return self.prior(self.params, key)

    def _step(self, state, td, key):
        state, step_td = self.world_model(self.params, state, td, key)
        if "terminated" not in step_td and "truncated" not in step_td:
            done_shape = self.batch_size + (1,)
            step_td = step_td.set("terminated", jnp.zeros(done_shape, jnp.bool_))
        return state, step_td

    def set_params(self, params) -> "ModelBasedEnv":
        out = ModelBasedEnv(
            self.world_model, self.prior, params=params,
            observation_spec=self._observation_spec,
            action_spec=self._action_leaf_spec, batch_size=self.batch_size,
        )
        return out
