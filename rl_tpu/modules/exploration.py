"""Exploration modules (ε-greedy, additive Gaussian, Ornstein-Uhlenbeck).

Functional counterparts of the reference exploration layer
(``/root/reference/torchrl/modules/tensordict_module/exploration.py``):
``EGreedyModule`` :38, ``AdditiveGaussianModule`` :252,
``OrnsteinUhlenbeckProcessModule`` :428, ``RandomPolicy`` :771.

Annealing counters and process noise are explicit state pytrees owned by the
caller (the collector/trainer), updated via ``step(state)`` — the reference's
in-module buffers don't survive jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict, TensorSpec
from .td_module import exploration_type, ExplorationType

__all__ = [
    "EGreedyModule",
    "AdditiveGaussianModule",
    "OrnsteinUhlenbeckProcessModule",
    "RandomPolicy",
]


class EGreedyModule:
    """ε-greedy action replacement with linear annealing (reference :38)."""

    def __init__(
        self,
        spec: TensorSpec,
        eps_init: float = 1.0,
        eps_end: float = 0.1,
        annealing_num_steps: int = 1000,
        action_key: str = "action",
    ):
        self.spec = spec
        self.eps_init = float(eps_init)
        self.eps_end = float(eps_end)
        self.annealing_num_steps = int(annealing_num_steps)
        self.action_key = action_key
        self.in_keys = [action_key]
        self.out_keys = [action_key]

    def init_state(self) -> TDict:
        return TDict(eps=jnp.asarray(self.eps_init, jnp.float32))

    def step(self, state: TDict, n: int = 1) -> TDict:
        """Anneal ε (call once per collected frame/batch)."""
        delta = (self.eps_init - self.eps_end) / self.annealing_num_steps
        return state.set(
            "eps", jnp.maximum(self.eps_end, state["eps"] - delta * n)
        )

    def __call__(self, state: TDict, td: TDict, key) -> TDict:
        if exploration_type() != ExplorationType.RANDOM:
            return td
        k_mask, k_rand = jax.random.split(key)
        action = jnp.asarray(td[self.action_key])
        batch = action.shape[: action.ndim - len(self.spec.shape)]
        explore = jax.random.bernoulli(k_mask, state["eps"], batch)
        random_action = self.spec.rand(k_rand, batch)
        explore_b = explore.reshape(batch + (1,) * len(self.spec.shape))
        return td.set(
            self.action_key,
            jnp.where(explore_b if self.spec.shape else explore, random_action, action),
        )


class AdditiveGaussianModule:
    """Annealed additive Gaussian action noise (reference :252)."""

    def __init__(
        self,
        spec: TensorSpec,
        sigma_init: float = 1.0,
        sigma_end: float = 0.1,
        annealing_num_steps: int = 1000,
        mean: float = 0.0,
        action_key: str = "action",
    ):
        self.spec = spec
        self.sigma_init = float(sigma_init)
        self.sigma_end = float(sigma_end)
        self.annealing_num_steps = int(annealing_num_steps)
        self.mean = float(mean)
        self.action_key = action_key

    def init_state(self) -> TDict:
        return TDict(sigma=jnp.asarray(self.sigma_init, jnp.float32))

    def step(self, state: TDict, n: int = 1) -> TDict:
        delta = (self.sigma_init - self.sigma_end) / self.annealing_num_steps
        return state.set(
            "sigma", jnp.maximum(self.sigma_end, state["sigma"] - delta * n)
        )

    def __call__(self, state: TDict, td: TDict, key) -> TDict:
        if exploration_type() != ExplorationType.RANDOM:
            return td
        action = jnp.asarray(td[self.action_key])
        noise = jax.random.normal(key, action.shape, action.dtype) * state["sigma"] + self.mean
        return td.set(self.action_key, self.spec.project(action + noise))


class OrnsteinUhlenbeckProcessModule:
    """Temporally-correlated OU noise (reference :428).

    Noise state is per-batch-element and resets where ``is_init`` is set
    (pair with the InitTracker transform).
    """

    def __init__(
        self,
        spec: TensorSpec,
        theta: float = 0.15,
        sigma: float = 0.2,
        dt: float = 1e-2,
        action_key: str = "action",
        is_init_key: str = "is_init",
    ):
        self.spec = spec
        self.theta = theta
        self.sigma = sigma
        self.dt = dt
        self.action_key = action_key
        self.is_init_key = is_init_key

    def init_state(self, batch_shape=()) -> TDict:
        return TDict(noise=jnp.zeros(tuple(batch_shape) + self.spec.shape, jnp.float32))

    def __call__(self, state: TDict, td: TDict, key) -> tuple[TDict, TDict]:
        if exploration_type() != ExplorationType.RANDOM:
            return state, td
        noise = state["noise"]
        if self.is_init_key in td:
            is_init = jnp.asarray(td[self.is_init_key])
            if is_init.shape and is_init.shape[-1] == 1:
                is_init = is_init.squeeze(-1)
            mask = is_init.reshape(is_init.shape + (1,) * (noise.ndim - is_init.ndim))
            noise = jnp.where(mask, 0.0, noise)
        dn = (
            -self.theta * noise * self.dt
            + self.sigma * jnp.sqrt(jnp.asarray(self.dt))
            * jax.random.normal(key, noise.shape)
        )
        noise = noise + dn
        action = jnp.asarray(td[self.action_key]) + noise
        return state.set("noise", noise), td.set(
            self.action_key, self.spec.project(action)
        )


class RandomPolicy:
    """Uniformly random policy from a spec (reference :771)."""

    def __init__(self, spec: TensorSpec, action_key: str = "action"):
        self.spec = spec
        self.action_key = action_key

    def __call__(self, td: TDict, key) -> TDict:
        batch = ()
        return td.set(self.action_key, self.spec.rand(key, batch))
