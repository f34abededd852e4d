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

from rl_tpu.data import Composite, TDict, TensorSpec, Unbounded
from .base import Env

__all__ = ["ModelBasedEnv", "WorldModelEnv", "ImaginedEnv", "DreamerEnv"]


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


class WorldModelEnv(ModelBasedEnv):
    """Drive a :class:`rl_tpu.modules.WorldModel` through the Env API.

    Counterpart of the reference ``WorldModelEnv``
    (``/root/reference/torchrl/envs/model_based/world_model_env.py:20``):
    steps in latent space (the encoder is NOT rerun per step); the caller
    seeds the latent on reset, typically by encoding a real observation —
    pass the encoded TDict as ``seed_td`` (or call :meth:`from_obs`).

    Action / reward / done specs are taken from ``base_env`` (only its specs
    are read; it is never stepped).  The observation spec defaults to the
    latent under ``latent_key``.
    """

    def __init__(self, world_model, base_env, *, params=None, seed_td=None,
                 latent_key="latent", observation_spec=None, batch_size=None,
                 latent_dim=None):
        self.wm = world_model
        self.latent_key = latent_key
        self.base_env = base_env
        if batch_size is None:
            batch_size = base_env.batch_size if base_env.batch_size else (1,)
        if observation_spec is None:
            if seed_td is not None:
                lat = jnp.asarray(seed_td[latent_key])
                latent_dim = lat.shape[-1]
            if latent_dim is None:
                raise ValueError(
                    "pass seed_td, latent_dim or observation_spec")
            observation_spec = Composite(
                {latent_key: Unbounded((latent_dim,), jnp.float32)})
        self._seed_td = seed_td

        def prior(p, key):
            if self._seed_td is None:
                td0 = observation_spec.zero(tuple(batch_size))
            else:
                td0 = self._seed_td
            return None, td0

        def step_fn(p, state, td, key):
            out = self.wm.step(p, td, key)
            nxt = out.get("next")
            # promote ("next", latent) and heads into the step result
            step = TDict({latent_key: nxt[latent_key]})
            if "reward" in nxt:
                step = step.set("reward", nxt["reward"])
            if "done" in nxt:
                d = jnp.asarray(nxt["done"])
                step = step.set("terminated", d.astype(jnp.bool_))
            return state, step

        super().__init__(
            step_fn, prior, params=params,
            observation_spec=observation_spec,
            action_spec=base_env.action_spec, batch_size=tuple(batch_size),
        )

    def from_obs(self, params, obs_td, key=None) -> "WorldModelEnv":
        """Seed imagination from a real observation via the encoder."""
        self._seed_td = self.wm.encode(params, obs_td, key).select(
            self.latent_key)
        self.params = params
        return self


class ImaginedEnv(ModelBasedEnv):
    """Uncertainty-aware imagination env for model-based policy search
    (PILCO-style).  Counterpart of the reference ``ImaginedEnv``
    (``/root/reference/torchrl/envs/model_based/imagined.py:17``).

    Observations carry mean and covariance under
    ``("observation", "mean")`` / ``("observation", "var")``; the world
    model maps ``(action, observation) -> (("next","observation","mean"),
    ("next","observation","var"))``.  Never terminates on its own.
    """

    def __init__(self, world_model_module, base_env, *, params=None,
                 batch_size=None, init_state=None):
        self.wm_module = world_model_module
        if batch_size is None:
            batch_size = base_env.batch_size if base_env.batch_size else (1,)
        batch_size = tuple(batch_size)
        obs_spec = base_env.observation_spec["observation"]
        obs_dim = obs_spec.shape[-1]
        observation_spec = Composite(observation=Composite(
            mean=Unbounded((obs_dim,), jnp.float32),
            var=Unbounded((obs_dim, obs_dim), jnp.float32),
        ))
        self._init_state = init_state

        def prior(p, key):
            if self._init_state is not None:
                mean = jnp.broadcast_to(
                    jnp.asarray(self._init_state), batch_size + (obs_dim,))
            else:
                mean = jnp.zeros(batch_size + (obs_dim,))
            var = jnp.broadcast_to(
                1e-2 * jnp.eye(obs_dim), batch_size + (obs_dim, obs_dim))
            return None, TDict(observation=TDict(mean=mean, var=var))

        def step_fn(p, state, td, key):
            out = self.wm_module(p, td, key=key)
            nxt = out["next"]
            step = TDict(observation=TDict(
                mean=nxt["observation", "mean"],
                var=nxt["observation", "var"],
            ))
            if "reward" in nxt:
                step = step.set("reward", nxt["reward"])
            step = step.set(
                "terminated", jnp.zeros(batch_size + (1,), jnp.bool_))
            return state, step

        super().__init__(
            step_fn, prior, params=params,
            observation_spec=observation_spec,
            action_spec=base_env.action_spec, batch_size=batch_size,
        )


class DreamerEnv(ModelBasedEnv):
    """Dreamer imagination env: steps the RSSM prior in latent space.

    Counterpart of the reference ``DreamerEnv``
    (``/root/reference/torchrl/envs/model_based/dreamer.py:17``): latent
    observations under ``"state"`` (stochastic z) and ``"belief"``
    (deterministic h); reward from the RSSM reward head; never terminates
    (rollout length bounds imagination, like the reference's
    ``allow_done_after_reset`` + horizon-driven use).

    ``seed`` (h0, z0) arrays select where imagination starts — typically
    posterior samples from a replay batch (``rssm_observe`` output).
    """

    def __init__(self, rssm, params, action_spec, *, batch_size=(),
                 seed=None):
        from rl_tpu.modules.world_model import RSSM  # local: avoid cycle
        self.rssm = rssm
        self._seed = seed
        batch_size = tuple(batch_size)
        observation_spec = Composite(
            state=Unbounded((rssm.stoch_dim,), jnp.float32),
            belief=Unbounded((rssm.deter_dim,), jnp.float32),
        )

        def prior(p, key):
            if self._seed is not None:
                h0, z0 = self._seed
            else:
                h0 = jnp.zeros(batch_size + (rssm.deter_dim,))
                z0 = jnp.zeros(batch_size + (rssm.stoch_dim,))
            return (h0, z0), TDict(state=z0, belief=h0)

        def step_fn(p, state, td, key):
            h, z = state
            if isinstance(p, TDict):
                p = p.to_dict()
            h, z, _ = rssm.apply({"params": p}, h, z,
                                 jnp.asarray(td["action"]), key,
                                 method=type(rssm).step_prior)
            r = rssm.apply({"params": p}, h, z, method=type(rssm).reward)
            step = TDict(state=z, belief=h, reward=r,
                         terminated=jnp.zeros(batch_size + (1,), jnp.bool_))
            return (h, z), step

        super().__init__(
            step_fn, prior, params=params,
            observation_spec=observation_spec,
            action_spec=action_spec, batch_size=batch_size,
        )

    def set_seed_latents(self, h0, z0) -> "DreamerEnv":
        self._seed = (h0, z0)
        return self
