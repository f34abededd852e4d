"""PPO objectives.

Counterparts of the reference PPO family
(``/root/reference/torchrl/objectives/ppo.py``: ``PPOLoss`` :108,
``ClipPPOLoss`` :1078, ``KLPENPPOLoss`` :1455).

Losses are pure: ``params = TDict(actor=…, critic=…)``; the input td must
carry ``advantage``, ``value_target`` (from a value estimator),
``sample_log_prob`` (behaviour log-prob) and the action.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss

__all__ = ["PPOLoss", "ClipPPOLoss", "KLPENPPOLoss"]


class PPOLoss(LossModule):
    """Vanilla policy-gradient PPO (no clip) (reference ppo.py:108)."""

    def __init__(
        self,
        actor,
        critic,
        *,
        entropy_coeff: float = 0.01,
        critic_coeff: float = 1.0,
        loss_critic_type: str = "smooth_l1",
        normalize_advantage: bool = False,
        entropy_bonus: bool = True,
        log_prob_key: str = "sample_log_prob",
        clip_value: float | None = None,
        shared_params: bool = False,
    ):
        self.actor = actor
        self.critic = critic
        # shared_params=True: actor and critic read the SAME param tree
        # (shared-trunk ActorValueOperator, reference common-module PPO) —
        # init defers to the actor and no per-role subtree indexing happens
        self.shared_params = shared_params
        self.entropy_coeff = entropy_coeff
        self.critic_coeff = critic_coeff
        self.loss_critic_type = loss_critic_type
        self.normalize_advantage = normalize_advantage
        self.entropy_bonus = entropy_bonus
        self.log_prob_key = log_prob_key
        self.clip_value = clip_value

    def init(self, key, td: TDict) -> TDict:
        if self.shared_params:
            return TDict(self.actor.init(key, td))
        k1, k2 = jax.random.split(key)
        return TDict(actor=self.actor.init(k1, td), critic=self.critic.init(k2, td))

    # -- pieces -------------------------------------------------------------
    def _log_weight(self, params, td: TDict, key=None):
        p = params if self.shared_params else params["actor"]
        dist, _ = self.actor.get_dist(p, td, key=key)
        action_key = getattr(self.actor, "out_key", "action")
        log_prob = dist.log_prob(td[action_key])
        prev_log_prob = jax.lax.stop_gradient(jnp.asarray(td[self.log_prob_key]))
        return log_prob - prev_log_prob, dist, log_prob

    def _entropy(self, dist, log_prob):
        try:
            return dist.entropy()
        except NotImplementedError:
            # MC estimate (reference fallback for squashed dists)
            return -log_prob

    def loss_critic(self, params, td: TDict):
        p = params if self.shared_params else params["critic"]
        td_v = self.critic(p, td)
        value = td_v["state_value"]
        target = jax.lax.stop_gradient(jnp.asarray(td["value_target"]))
        loss = distance_loss(value, target, self.loss_critic_type)
        if self.clip_value is not None and "state_value" in td:
            # clipped value loss (reference clip_value option)
            old_value = jax.lax.stop_gradient(jnp.asarray(td["state_value"]))
            clipped = old_value + jnp.clip(
                value - old_value, -self.clip_value, self.clip_value
            )
            loss = jnp.maximum(loss, distance_loss(clipped, target, self.loss_critic_type))
        return loss.mean()

    def _advantage(self, td: TDict):
        adv = jnp.asarray(td["advantage"], jnp.float32)
        if self.normalize_advantage:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        return jax.lax.stop_gradient(adv)

    def _objective(self, log_weight, adv):
        return -(jnp.exp(log_weight) * adv.squeeze(-1) if adv.ndim > log_weight.ndim else jnp.exp(log_weight) * adv)

    # -- main ---------------------------------------------------------------
    def loss(self, params, td: TDict, key=None) -> TDict:
        adv = self._advantage(td)
        log_weight, dist, log_prob = self._log_weight(params, td, key)
        adv_flat = adv.squeeze(-1) if adv.ndim == log_weight.ndim + 1 else adv
        loss_objective = (-(jnp.exp(log_weight) * adv_flat)).mean()
        out = TDict(loss_objective=loss_objective)
        if self.entropy_bonus:
            ent = self._entropy(dist, log_prob)
            out = out.set("entropy", jax.lax.stop_gradient(ent.mean()))
            out = out.set("loss_entropy", -self.entropy_coeff * ent.mean())
        if self.critic_coeff:
            out = out.set("loss_critic", self.critic_coeff * self.loss_critic(params, td))
        out = out.set("kl_approx", jax.lax.stop_gradient(-log_weight.mean()))
        return out


class ClipPPOLoss(PPOLoss):
    """Clipped-surrogate PPO (reference ppo.py:1078)."""

    def __init__(self, actor, critic, *, clip_epsilon: float = 0.2, **kwargs):
        super().__init__(actor, critic, **kwargs)
        self.clip_epsilon = float(clip_epsilon)

    def loss(self, params, td: TDict, key=None) -> TDict:
        adv = self._advantage(td)
        log_weight, dist, log_prob = self._log_weight(params, td, key)
        adv_flat = adv.squeeze(-1) if adv.ndim == log_weight.ndim + 1 else adv
        ratio = jnp.exp(log_weight)
        clipped_ratio = jnp.clip(ratio, 1 - self.clip_epsilon, 1 + self.clip_epsilon)
        surrogate = jnp.minimum(ratio * adv_flat, clipped_ratio * adv_flat)
        loss_objective = -surrogate.mean()
        clip_fraction = (jnp.abs(ratio - 1.0) > self.clip_epsilon).astype(jnp.float32).mean()
        ess = jax.lax.stop_gradient(
            (ratio.sum() ** 2) / jnp.maximum((ratio**2).sum(), 1e-8)
        )
        out = TDict(
            loss_objective=loss_objective,
            clip_fraction=jax.lax.stop_gradient(clip_fraction),
            ESS=ess,
        )
        if self.entropy_bonus:
            ent = self._entropy(dist, log_prob)
            out = out.set("entropy", jax.lax.stop_gradient(ent.mean()))
            out = out.set("loss_entropy", -self.entropy_coeff * ent.mean())
        if self.critic_coeff:
            out = out.set("loss_critic", self.critic_coeff * self.loss_critic(params, td))
        out = out.set("kl_approx", jax.lax.stop_gradient(-log_weight.mean()))
        return out


class KLPENPPOLoss(PPOLoss):
    """KL-penalty PPO (reference ppo.py:1455).

    The adaptive β lives in explicit state: call ``update_beta(beta, kl)``
    after each optimization phase (reference doubles/halves β around
    ``dtarg``).
    """

    def __init__(
        self,
        actor,
        critic,
        *,
        dtarg: float = 0.01,
        beta: float = 1.0,
        increment: float = 2.0,
        decrement: float = 0.5,
        **kwargs,
    ):
        super().__init__(actor, critic, **kwargs)
        self.dtarg = dtarg
        self.beta_init = beta
        self.increment = increment
        self.decrement = decrement

    def init_beta(self):
        return jnp.asarray(self.beta_init, jnp.float32)

    def update_beta(self, beta, kl):
        return jnp.where(
            kl > self.dtarg * 1.5,
            beta * self.increment,
            jnp.where(kl < self.dtarg / 1.5, beta * self.decrement, beta),
        )

    def loss(self, params, td: TDict, key=None, beta=None) -> TDict:
        if beta is None:
            beta = self.beta_init
        adv = self._advantage(td)
        log_weight, dist, log_prob = self._log_weight(params, td, key)
        adv_flat = adv.squeeze(-1) if adv.ndim == log_weight.ndim + 1 else adv
        kl = -log_weight  # first-order KL estimate
        loss_objective = -(jnp.exp(log_weight) * adv_flat).mean() + beta * kl.mean()
        out = TDict(
            loss_objective=loss_objective,
            kl=jax.lax.stop_gradient(kl.mean()),
        )
        if self.entropy_bonus:
            ent = self._entropy(dist, log_prob)
            out = out.set("entropy", jax.lax.stop_gradient(ent.mean()))
            out = out.set("loss_entropy", -self.entropy_coeff * ent.mean())
        if self.critic_coeff:
            out = out.set("loss_critic", self.critic_coeff * self.loss_critic(params, td))
        return out
