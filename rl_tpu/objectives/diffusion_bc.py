"""Diffusion behavioral cloning: ε-prediction MSE.

Counterpart of ``/root/reference/torchrl/objectives/diffusion_bc.py``
(``DiffusionBCLoss`` :17): corrupt demonstration actions at random
timesteps, train the score network to recover the injected noise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule

__all__ = ["DiffusionBCLoss"]


class DiffusionBCLoss(LossModule):
    """ε-prediction MSE (reference diffusion_bc.py:130).

    ``actor``: a :class:`rl_tpu.modules.diffusion.DiffusionActor` (the loss
    drives its DDPM scheduler directly).  Batch keys: ``observation``,
    ``action`` (the clean demonstration actions).
    """

    def __init__(self, actor, *, obs_key="observation", action_key="action"):
        self.actor = actor
        self.ddpm = actor.ddpm
        self.obs_key = obs_key
        self.action_key = action_key

    def init(self, key, td: TDict):
        return self.actor.init(key, td)

    def loss(self, params, td: TDict, key=None) -> TDict:
        if key is None:
            raise ValueError("DiffusionBCLoss needs a PRNG key")
        clean = jnp.asarray(td[self.action_key], jnp.float32)
        obs = jnp.asarray(td[self.obs_key], jnp.float32)
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(
            k_t, clean.shape[:-1], 0, self.ddpm.num_steps
        )
        noisy, noise = self.ddpm.add_noise(k_n, clean, t)
        pred = self.ddpm.predict_noise(params, noisy, obs, t)
        return TDict(loss_diffusion_bc=((pred - noise) ** 2).mean())
