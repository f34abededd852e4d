"""SAC objectives.

Counterpart of ``/root/reference/torchrl/objectives/sac.py``: ``SACLoss``
:60 (v2 default: twin Qs, no value net, auto-α), ``DiscreteSACLoss`` :985.

``params = TDict(actor=…, qvalue=<stacked N>, target_qvalue=…, log_alpha)``;
the critic ensemble is a vmap over stacked param pytrees (the reference's
``convert_to_functional`` expand, common.py:441-468).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss, make_target_params, stack_params, distance_loss

__all__ = ["SACLoss", "DiscreteSACLoss"]


class SACLoss(LossModule):
    def __init__(
        self,
        actor,
        qvalue,
        *,
        num_qvalue_nets: int = 2,
        gamma: float = 0.99,
        alpha_init: float = 1.0,
        min_alpha: float | None = None,
        max_alpha: float | None = None,
        fixed_alpha: bool = False,
        target_entropy: float | str = "auto",
        action_dim: int | None = None,
        loss_function: str = "l2",
        q_out_key: str = "state_action_value",
    ):
        self.actor = actor
        self.qvalue = qvalue
        self.num_qvalue_nets = int(num_qvalue_nets)
        self.gamma = float(gamma)
        self.alpha_init = float(alpha_init)
        self.fixed_alpha = fixed_alpha
        self.loss_function = loss_function
        self.q_out_key = q_out_key
        if target_entropy == "auto":
            if action_dim is None:
                raise ValueError("target_entropy='auto' needs action_dim")
            target_entropy = -float(action_dim)
        self.target_entropy = float(target_entropy)

    def init(self, key, td: TDict) -> TDict:
        ks = jax.random.split(key, self.num_qvalue_nets + 1)
        p_actor = self.actor.init(ks[0], td)
        td_a = self.actor(p_actor, td, key=ks[0])
        qs = [self.qvalue.init(k, td_a) for k in ks[1:]]
        p_q = stack_params(qs)
        return TDict(
            actor=p_actor,
            qvalue=p_q,
            target_qvalue=make_target_params(p_q),
            log_alpha=jnp.asarray(math.log(self.alpha_init), jnp.float32),
        )

    # -- helpers ------------------------------------------------------------
    def _q_ensemble(self, q_params, td: TDict) -> jax.Array:
        """[N, ..., 1] state-action values from stacked params."""
        def one(p):
            return self.qvalue(p, td)[self.q_out_key]

        return jax.vmap(one)(q_params)

    def _q_min(self, q_params, td: TDict) -> jax.Array:
        return jnp.min(self._q_ensemble(q_params, td), axis=0)

    # -- main ---------------------------------------------------------------
    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        k_actor, k_next = jax.random.split(key)
        alpha = jax.lax.stop_gradient(jnp.exp(params["log_alpha"]))

        # actor loss: α·logπ − min Q(s, a~π), critic held out
        dist, _ = self.actor.get_dist(params["actor"], td)
        a_new = dist.rsample(k_actor)
        log_prob = dist.log_prob(a_new)
        q_held = jax.lax.stop_gradient(params["qvalue"])
        q_pi = self._q_min(q_held, td.set("action", a_new)).squeeze(-1)
        loss_actor = (alpha * log_prob - q_pi).mean()

        # critic loss
        next_td = td["next"]
        next_dist, _ = self.actor.get_dist(
            jax.lax.stop_gradient(params["actor"]), next_td
        )
        a_next = next_dist.rsample(k_next)
        log_prob_next = next_dist.log_prob(a_next)
        q_next = self._q_min(
            params["target_qvalue"], next_td.set("action", a_next)
        ).squeeze(-1)
        soft_v = q_next - alpha * log_prob_next
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * soft_v)

        qs = self._q_ensemble(params["qvalue"], td).squeeze(-1)  # [N, B]
        td_error = jnp.abs(qs - target[None])
        loss_qvalue = distance_loss(qs, target[None], self.loss_function).mean()

        # alpha loss
        if self.fixed_alpha:
            loss_alpha = jnp.zeros(())
        else:
            loss_alpha = -(
                params["log_alpha"]
                * jax.lax.stop_gradient(log_prob + self.target_entropy)
            ).mean()

        return TDict(
            loss_actor=loss_actor,
            loss_qvalue=loss_qvalue,
            loss_alpha=loss_alpha,
            alpha=alpha,
            entropy=jax.lax.stop_gradient(-log_prob.mean()),
            td_error=jax.lax.stop_gradient(td_error.max(axis=0)),
        )


class DiscreteSACLoss(LossModule):
    """Discrete-action SAC (Christodoulou 2019; reference sac.py:985).

    ``qvalue`` writes per-action values ``action_value`` [..., n]; the actor
    produces categorical logits.
    """

    def __init__(
        self,
        actor,
        qvalue,
        *,
        num_actions: int,
        num_qvalue_nets: int = 2,
        gamma: float = 0.99,
        alpha_init: float = 1.0,
        fixed_alpha: bool = False,
        target_entropy_weight: float = 0.98,
        loss_function: str = "l2",
        q_out_key: str = "action_value",
    ):
        self.actor = actor
        self.qvalue = qvalue
        self.num_actions = int(num_actions)
        self.num_qvalue_nets = int(num_qvalue_nets)
        self.gamma = float(gamma)
        self.alpha_init = float(alpha_init)
        self.fixed_alpha = fixed_alpha
        self.loss_function = loss_function
        self.q_out_key = q_out_key
        self.target_entropy = target_entropy_weight * math.log(self.num_actions)

    def init(self, key, td: TDict) -> TDict:
        ks = jax.random.split(key, self.num_qvalue_nets + 1)
        p_actor = self.actor.init(ks[0], td)
        qs = [self.qvalue.init(k, td) for k in ks[1:]]
        p_q = stack_params(qs)
        return TDict(
            actor=p_actor,
            qvalue=p_q,
            target_qvalue=make_target_params(p_q),
            log_alpha=jnp.asarray(math.log(self.alpha_init), jnp.float32),
        )

    def _qs(self, q_params, td):
        return jax.vmap(lambda p: self.qvalue(p, td)[self.q_out_key])(q_params)

    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        alpha = jax.lax.stop_gradient(jnp.exp(params["log_alpha"]))

        dist, _ = self.actor.get_dist(params["actor"], td)
        probs = dist.probs
        log_probs = dist.logits

        q_all = self._qs(jax.lax.stop_gradient(params["qvalue"]), td)  # [N, B, A]
        q_min = jnp.min(q_all, axis=0)
        loss_actor = (probs * (alpha * log_probs - q_min)).sum(-1).mean()

        # critic: expected soft value of next state under current policy
        next_td = td["next"]
        next_dist, _ = self.actor.get_dist(
            jax.lax.stop_gradient(params["actor"]), next_td
        )
        next_probs = next_dist.probs
        next_log_probs = next_dist.logits
        q_next = jnp.min(self._qs(params["target_qvalue"], next_td), axis=0)
        v_next = (next_probs * (q_next - alpha * next_log_probs)).sum(-1)
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * v_next)

        action = jnp.asarray(td["action"], jnp.int32)
        qs_all = self._qs(params["qvalue"], td)  # [N, B, A]
        q_taken = jnp.take_along_axis(qs_all, action[None, ..., None], axis=-1).squeeze(-1)
        td_error = jnp.abs(q_taken - target[None])
        loss_qvalue = distance_loss(q_taken, target[None], self.loss_function).mean()

        entropy = -(probs * log_probs).sum(-1)
        if self.fixed_alpha:
            loss_alpha = jnp.zeros(())
        else:
            loss_alpha = (
                params["log_alpha"]
                * jax.lax.stop_gradient(entropy - self.target_entropy)
            ).mean()

        return TDict(
            loss_actor=loss_actor,
            loss_qvalue=loss_qvalue,
            loss_alpha=loss_alpha,
            alpha=alpha,
            entropy=jax.lax.stop_gradient(entropy.mean()),
            td_error=jax.lax.stop_gradient(td_error.max(axis=0)),
        )
