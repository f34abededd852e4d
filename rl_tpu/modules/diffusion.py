"""Diffusion policy: DDPM over actions conditioned on observations.

Counterpart of the reference ``DiffusionActor``
(``/root/reference/torchrl/modules/tensordict_module/actors.py:2827``) and
its ``_DDPMModule``: an ε-prediction score network denoises a Gaussian
latent into an action over ``num_steps`` reverse steps.  The reverse chain
is a single ``lax.scan`` (the reference's Python loop fused under jit).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl_tpu.data import TDict

__all__ = ["DDPM", "DiffusionActor"]


class _ScoreMLP(nn.Module):
    """Default score net: (noisy_action ‖ obs ‖ t) → ε (reference's MLP)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, noisy_action, observation, t):
        t = jnp.asarray(t, jnp.float32)
        if t.ndim < noisy_action.ndim:
            t = jnp.broadcast_to(
                t[..., None], noisy_action.shape[:-1] + (1,)
            )
        x = jnp.concatenate(
            [noisy_action, jnp.asarray(observation, jnp.float32), t], -1
        )
        for w in self.hidden:
            h = nn.Dense(w)(x)
            x = h * jnp.tanh(jax.nn.softplus(h))  # mish
        return nn.Dense(self.action_dim)(x)


class DDPM:
    """Fixed-β DDPM scheduler (linear schedule), jittable throughout."""

    def __init__(self, action_dim: int, *, num_steps: int = 100,
                 beta_start: float = 1e-4, beta_end: float = 0.02,
                 score_network=None):
        self.action_dim = action_dim
        self.num_steps = int(num_steps)
        self.score_network = score_network or _ScoreMLP(action_dim=action_dim)
        betas = jnp.linspace(beta_start, beta_end, num_steps)
        alphas = 1.0 - betas
        self.betas = betas
        self.alphas = alphas
        self.alpha_bars = jnp.cumprod(alphas)

    def init(self, key, observation):
        obs = jnp.asarray(observation, jnp.float32)
        a = jnp.zeros(obs.shape[:-1] + (self.action_dim,))
        t = jnp.zeros(obs.shape[:-1], jnp.float32)
        return self.score_network.init(key, a, obs, t)["params"]

    def add_noise(self, key, clean_action, t):
        """Forward diffusion: x_t = √ᾱ_t x_0 + √(1-ᾱ_t) ε."""
        ab = self.alpha_bars[t][..., None]
        noise = jax.random.normal(key, clean_action.shape)
        return jnp.sqrt(ab) * clean_action + jnp.sqrt(1 - ab) * noise, noise

    def _plain(self, p):
        return p.to_dict() if isinstance(p, TDict) else p

    def predict_noise(self, params, noisy_action, observation, t):
        tf = jnp.asarray(t, jnp.float32) / self.num_steps
        return self.score_network.apply(
            {"params": self._plain(params)}, noisy_action, observation, tf
        )

    def sample(self, params, observation, key, *, deterministic: bool = False):
        """Reverse chain from pure noise, fused as one lax.scan."""
        obs = jnp.asarray(observation, jnp.float32)
        shape = obs.shape[:-1] + (self.action_dim,)
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, shape)

        def body(x, inputs):
            t, k = inputs
            eps = self.predict_noise(
                params, x, obs, jnp.full(obs.shape[:-1], t)
            )
            alpha = self.alphas[t]
            ab = self.alpha_bars[t]
            mean = (x - (1 - alpha) / jnp.sqrt(1 - ab) * eps) / jnp.sqrt(alpha)
            sigma = jnp.sqrt(self.betas[t])
            noise = jax.random.normal(k, shape)
            add = jnp.where(
                deterministic, 0.0, jnp.where(t > 0, 1.0, 0.0)
            )
            return mean + add * sigma * noise, None

        ts = jnp.arange(self.num_steps - 1, -1, -1)
        ks = jax.random.split(key, self.num_steps)
        x, _ = jax.lax.scan(body, x, (ts, ks))
        return x


class DiffusionActor:
    """TDModule-style diffusion policy (reference actors.py:2827):
    ``in_keys=["observation"] → out_keys=["action"]``.  DETERMINISTIC
    exploration disables in-chain noise injection (same contract as the
    reference's interaction-type handling)."""

    in_keys = ["observation"]
    out_keys = ["action"]

    def __init__(self, action_dim: int, *, num_steps: int = 100,
                 score_network=None, obs_key="observation",
                 action_key="action", deterministic: bool = False):
        self.ddpm = DDPM(action_dim, num_steps=num_steps,
                         score_network=score_network)
        self.obs_key = obs_key
        self.action_key = action_key
        self.deterministic = deterministic

    def init(self, key, td: TDict):
        return self.ddpm.init(key, td[self.obs_key])

    def __call__(self, params, td: TDict, key=None) -> TDict:
        if key is None:
            key = jax.random.PRNGKey(0)
        action = self.ddpm.sample(
            params, td[self.obs_key], key, deterministic=self.deterministic
        )
        return td.set(self.action_key, action)
