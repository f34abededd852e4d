"""Dreamer objectives.

Counterparts of ``/root/reference/torchrl/objectives/dreamer.py`` (v1 losses
:28 model, :211 actor, :373 value) and ``world_model_loss.py:19``.

Three jointly-trained pieces:
* **model**: reconstruction + reward prediction + KL(posterior ‖ prior)
  with free nats and KL balancing;
* **actor**: maximize λ-returns of imagined trajectories (gradients flow
  through the learned dynamics — everything is differentiable JAX);
* **value**: regress imagined λ-returns.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss
from .value.functional import td_lambda_return_estimate
from rl_tpu.modules.world_model import RSSM, rssm_imagine, rssm_observe

__all__ = ["DreamerModelLoss", "DreamerActorLoss", "DreamerValueLoss"]


def _gauss_kl(qm, qs, pm, ps):
    """KL(N(qm,qs) || N(pm,ps)) summed over the latent dim."""
    return 0.5 * jnp.sum(
        (qs / ps) ** 2 + ((qm - pm) / ps) ** 2 - 1.0 + 2 * (jnp.log(ps) - jnp.log(qs)),
        axis=-1,
    )


class DreamerModelLoss(LossModule):
    """World-model ELBO (reference dreamer.py:28).

    ``encoder``/``decoder``: flax modules; ``rssm``: RSSM.  Batch: time-first
    [T, B] with observation/action/("next","reward")/is_init keys.
    """

    def __init__(self, encoder, decoder, rssm: RSSM, *,
                 free_nats: float = 3.0, kl_balance: float = 0.8,
                 reco_coeff: float = 1.0, reward_coeff: float = 1.0,
                 obs_key: str = "observation"):
        self.encoder = encoder
        self.decoder = decoder
        self.rssm = rssm
        self.free_nats = free_nats
        self.kl_balance = kl_balance
        self.reco_coeff = reco_coeff
        self.reward_coeff = reward_coeff
        self.obs_key = obs_key

    def init(self, key, td: TDict) -> TDict:
        k1, k2, k3 = jax.random.split(key, 3)
        obs = jnp.asarray(td[self.obs_key])
        p_enc = self.encoder.init(k1, obs)["params"]
        embed = self.encoder.apply({"params": p_enc}, obs)
        B = obs.shape[1]
        h = jnp.zeros((B, self.rssm.deter_dim))
        z = jnp.zeros((B, self.rssm.stoch_dim))
        p_rssm = self.rssm.init(k2, h, z, jnp.asarray(td["action"])[0], embed[0], k2)["params"]
        p_dec = self.decoder.init(k3, h, z)["params"]
        return TDict(encoder=p_enc, decoder=p_dec, rssm=p_rssm)

    def _plain(self, p):
        return p.to_dict() if isinstance(p, TDict) else p

    def observe(self, params, td: TDict, key):
        obs = jnp.asarray(td[self.obs_key])
        embed = self.encoder.apply({"params": self._plain(params["encoder"])}, obs)
        is_first = jnp.asarray(td["is_init"]) if "is_init" in td else jnp.zeros(
            obs.shape[:2] + (1,), bool
        )
        return rssm_observe(
            self.rssm, self._plain(params["rssm"]), embed,
            jnp.asarray(td["action"]), is_first, key,
        )

    def loss(self, params, td: TDict, key=None) -> TDict:
        post = self.observe(params, td, key)
        reco = self.decoder.apply(
            {"params": self._plain(params["decoder"])}, post["h"], post["z"]
        )
        obs = jnp.asarray(td[self.obs_key])
        loss_reco = distance_loss(reco, obs, "l2").sum(-1).mean()
        reward = jnp.asarray(td["next", "reward"], jnp.float32)
        loss_reward = distance_loss(post["pred_reward"], reward, "l2").mean()
        # KL balancing (stop-grad each side alternately; Dreamer v2 trick)
        qm, qs = post["post_mean"], post["post_std"]
        pm, ps = post["prior_mean"], post["prior_std"]
        sg = jax.lax.stop_gradient
        kl_post = _gauss_kl(qm, qs, sg(pm), sg(ps))
        kl_prior = _gauss_kl(sg(qm), sg(qs), pm, ps)
        kl = self.kl_balance * kl_prior + (1 - self.kl_balance) * kl_post
        kl = jnp.maximum(kl, self.free_nats).mean()
        return TDict(
            loss_model_reco=self.reco_coeff * loss_reco,
            loss_model_reward=self.reward_coeff * loss_reward,
            loss_model_kl=kl,
            kl_raw=jax.lax.stop_gradient(
                _gauss_kl(qm, qs, pm, ps).mean()
            ),
        )


class DreamerActorLoss(LossModule):
    """Imagination-return maximization (reference dreamer.py:211).

    ``actor_fn(params_actor, h, z, key) -> action`` (reparameterized);
    ``value_fn(params_value, h, z) -> value``.
    """

    def __init__(self, rssm: RSSM, actor_fn, value_fn, *,
                 imagination_horizon: int = 15, gamma: float = 0.99,
                 lmbda: float = 0.95):
        self.rssm = rssm
        self.actor_fn = actor_fn
        self.value_fn = value_fn
        self.imagination_horizon = imagination_horizon
        self.gamma = gamma
        self.lmbda = lmbda

    def _plain(self, p):
        return p.to_dict() if isinstance(p, TDict) else p

    def imagined_lambda_returns(self, params, start_h, start_z, key):
        sg = jax.lax.stop_gradient
        model_params = sg(self._plain(params["rssm"]))

        def policy(h, z, k):
            return self.actor_fn(params["actor"], h, z, k)

        imag = rssm_imagine(
            self.rssm, model_params, policy, sg(start_h), sg(start_z),
            self.imagination_horizon, key,
        )
        values = self.value_fn(sg(params["value"]), imag["h"], imag["z"])
        rewards = imag["pred_reward"]
        done = jnp.zeros_like(rewards, dtype=bool)
        returns = td_lambda_return_estimate(
            self.gamma, self.lmbda, values, rewards, done, done
        )
        return returns, imag, values

    def loss(self, params, td: TDict, key=None) -> TDict:
        start_h = jnp.asarray(td["h"]).reshape(-1, self.rssm.deter_dim)
        start_z = jnp.asarray(td["z"]).reshape(-1, self.rssm.stoch_dim)
        returns, imag, values = self.imagined_lambda_returns(
            params, start_h, start_z, key
        )
        return TDict(
            loss_actor=-returns.mean(),
            imagined_return=jax.lax.stop_gradient(returns.mean()),
        )


class DreamerValueLoss(LossModule):
    """Value regression on imagined λ-returns (reference dreamer.py:373)."""

    def __init__(self, value_fn, *, loss_function: str = "l2"):
        self.value_fn = value_fn
        self.loss_function = loss_function

    def loss(self, params, td: TDict, key=None) -> TDict:
        """``td`` carries imagined h/z/lambda_target (from the actor phase)."""
        values = self.value_fn(params["value"], td["h"], td["z"])
        target = jax.lax.stop_gradient(jnp.asarray(td["lambda_target"]))
        return TDict(
            loss_value=distance_loss(values, target, self.loss_function).mean()
        )
