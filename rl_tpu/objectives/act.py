"""ACT loss: CVAE behavioral cloning over action chunks.

Counterpart of ``/root/reference/torchrl/objectives/act.py`` (``ACTLoss``
:19): L1 chunk reconstruction + β·KL(N(mu, σ²) ‖ N(0, I)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule

__all__ = ["ACTLoss"]


class ACTLoss(LossModule):
    """L1 reconstruction + KL regularizer (reference act.py:153).

    ``model``: an :class:`rl_tpu.modules.act.ACTModel`.  Batch keys:
    ``observation`` [B, obs] and ``action_chunk`` [B, N, act].
    """

    def __init__(self, model, *, kl_weight: float = 10.0,
                 obs_key="observation", chunk_key="action_chunk"):
        self.model = model
        self.kl_weight = kl_weight
        self.obs_key = obs_key
        self.chunk_key = chunk_key

    def init(self, key, td: TDict) -> TDict:
        k1, k2 = jax.random.split(key)
        variables = self.model.init(
            k1, jnp.asarray(td[self.obs_key]),
            jnp.asarray(td[self.chunk_key]), z_key=k2,
        )
        return variables["params"]

    def _plain(self, p):
        return p.to_dict() if isinstance(p, TDict) else p

    def loss(self, params, td: TDict, key=None) -> TDict:
        chunk = jnp.asarray(td[self.chunk_key], jnp.float32)
        pred, mu, log_var = self.model.apply(
            {"params": self._plain(params)},
            jnp.asarray(td[self.obs_key]), chunk, z_key=key,
        )
        # L1 over chunk+action dims, mean over batch (reference act.py:186)
        loss_recon = jnp.abs(pred - chunk).mean(axis=(-2, -1)).mean()
        kl = -0.5 * jnp.sum(
            1.0 + log_var - mu * mu - jnp.exp(log_var), -1
        ).mean()
        return TDict(
            loss_act=loss_recon + self.kl_weight * kl,
            reconstruction=jax.lax.stop_gradient(loss_recon),
            kl=jax.lax.stop_gradient(kl),
        )
