"""RND predictor loss.

Counterpart of ``/root/reference/torchrl/objectives/rnd.py`` (``RNDLoss``
:20): train the predictor net to match the frozen random target on visited
observations; the residual IS the intrinsic reward, so minimizing it decays
curiosity for familiar states.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule

__all__ = ["RNDLoss"]


class RNDLoss(LossModule):
    """MSE(predictor(obs_norm), stop_grad(target(obs_norm))) (reference
    rnd.py:20).  ``params`` holds only the predictor; the frozen target
    params and normalization stats come from the transform state (pass them
    at construction or per-call via the td keys ``("rnd", ...)``)."""

    def __init__(self, rnd_transform, target_params=None, stats=None,
                 obs_key="observation"):
        self.t = rnd_transform
        self.target_params = target_params
        self.stats = stats
        self.obs_key = obs_key

    def init(self, key, td: TDict) -> TDict:
        obs = jnp.asarray(td[self.obs_key], jnp.float32)
        from rl_tpu.data import TDict as _TD
        return _TD(self.t.predictor_net.init(key, obs))

    def _normalize(self, obs, stats):
        if stats is None:
            return obs
        norm = (obs - stats["mean"]) / jnp.sqrt(stats["var"] + 1e-8)
        return jnp.clip(norm, -5.0, 5.0)

    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        obs = jnp.asarray(td[self.obs_key], jnp.float32)
        stats = self.stats if self.stats is not None else (
            td[("rnd", "stats")] if ("rnd", "stats") in td else None
        )
        tparams = self.target_params if self.target_params is not None else \
            td[("rnd", "target_params")]
        norm = self._normalize(obs, stats)
        tgt = jax.lax.stop_gradient(
            self.t.target_net.apply(TDict(tparams).to_dict(), norm))
        pred = self.t.predictor_net.apply(TDict(params).to_dict(), norm)
        loss = jnp.mean((tgt - pred) ** 2)
        return TDict(loss_rnd=loss)
