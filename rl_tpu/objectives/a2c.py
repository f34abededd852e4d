"""A2C and REINFORCE objectives.

Counterparts of ``/root/reference/torchrl/objectives/a2c.py:41`` (``A2CLoss``)
and ``reinforce.py:32`` (``ReinforceLoss``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss

__all__ = ["A2CLoss", "ReinforceLoss"]


class A2CLoss(LossModule):
    """Advantage actor-critic (reference a2c.py:41)."""

    def __init__(self, actor, critic, *, entropy_coeff: float = 0.01,
                 critic_coeff: float = 0.5, loss_critic_type: str = "smooth_l1"):
        self.actor = actor
        self.critic = critic
        self.entropy_coeff = entropy_coeff
        self.critic_coeff = critic_coeff
        self.loss_critic_type = loss_critic_type

    def init(self, key, td: TDict) -> TDict:
        k1, k2 = jax.random.split(key)
        return TDict(actor=self.actor.init(k1, td), critic=self.critic.init(k2, td))

    def loss(self, params, td: TDict, key=None) -> TDict:
        adv = jax.lax.stop_gradient(jnp.asarray(td["advantage"], jnp.float32))
        dist, _ = self.actor.get_dist(params["actor"], td, key=key)
        log_prob = dist.log_prob(td["action"])
        adv_flat = adv.squeeze(-1) if adv.ndim == log_prob.ndim + 1 else adv
        loss_objective = -(log_prob * adv_flat).mean()
        out = TDict(loss_objective=loss_objective)
        try:
            ent = dist.entropy()
        except NotImplementedError:
            ent = -log_prob
        out = out.set("entropy", jax.lax.stop_gradient(ent.mean()))
        out = out.set("loss_entropy", -self.entropy_coeff * ent.mean())
        if self.critic_coeff:
            td_v = self.critic(params["critic"], td)
            target = jax.lax.stop_gradient(jnp.asarray(td["value_target"]))
            out = out.set(
                "loss_critic",
                self.critic_coeff
                * distance_loss(td_v["state_value"], target, self.loss_critic_type).mean(),
            )
        return out


class ReinforceLoss(LossModule):
    """REINFORCE with optional learned baseline (reference reinforce.py:32)."""

    def __init__(self, actor, critic=None, *, loss_critic_type: str = "smooth_l1"):
        self.actor = actor
        self.critic = critic
        self.loss_critic_type = loss_critic_type

    def init(self, key, td: TDict) -> TDict:
        k1, k2 = jax.random.split(key)
        out = TDict(actor=self.actor.init(k1, td))
        if self.critic is not None:
            out = out.set("critic", self.critic.init(k2, td))
        return out

    def loss(self, params, td: TDict, key=None) -> TDict:
        adv = jax.lax.stop_gradient(jnp.asarray(td["advantage"], jnp.float32))
        dist, _ = self.actor.get_dist(params["actor"], td, key=key)
        log_prob = dist.log_prob(td["action"])
        adv_flat = adv.squeeze(-1) if adv.ndim == log_prob.ndim + 1 else adv
        out = TDict(loss_actor=-(log_prob * adv_flat).mean())
        if self.critic is not None:
            td_v = self.critic(params["critic"], td)
            target = jax.lax.stop_gradient(jnp.asarray(td["value_target"]))
            out = out.set(
                "loss_value",
                distance_loss(td_v["state_value"], target, self.loss_critic_type).mean(),
            )
        return out
