"""IQL objectives (offline RL).

Counterpart of ``/root/reference/torchrl/objectives/iql.py``: ``IQLLoss``
:30 (expectile value regression + AWR actor), ``DiscreteIQLLoss`` :572.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss, make_target_params, stack_params

__all__ = ["IQLLoss", "DiscreteIQLLoss"]


def expectile_loss(u: jax.Array, expectile: float) -> jax.Array:
    """L2_τ(u) = |τ − 1(u < 0)| · u²."""
    weight = jnp.where(u < 0, 1.0 - expectile, expectile)
    return weight * u**2


class IQLLoss(LossModule):
    """params: TDict(actor, qvalue (stacked 2), target_qvalue, value)."""

    def __init__(self, actor, qvalue, value, *, num_qvalue_nets: int = 2,
                 gamma: float = 0.99, expectile: float = 0.7,
                 temperature: float = 3.0, loss_function: str = "l2",
                 q_out_key: str = "state_action_value"):
        self.actor = actor
        self.qvalue = qvalue
        self.value = value
        self.num_qvalue_nets = num_qvalue_nets
        self.gamma = float(gamma)
        self.expectile = float(expectile)
        self.temperature = float(temperature)
        self.loss_function = loss_function
        self.q_out_key = q_out_key

    def init(self, key, td: TDict) -> TDict:
        ks = jax.random.split(key, self.num_qvalue_nets + 2)
        p_actor = self.actor.init(ks[0], td)
        td_a = self.actor(p_actor, td, key=ks[0])
        p_q = stack_params([self.qvalue.init(k, td_a) for k in ks[1:-1]])
        p_v = self.value.init(ks[-1], td)
        return TDict(actor=p_actor, qvalue=p_q,
                     target_qvalue=make_target_params(p_q), value=p_v)

    def _q_min(self, q_params, td):
        qs = jax.vmap(lambda p: self.qvalue(p, td)[self.q_out_key])(q_params)
        return jnp.min(qs, axis=0)

    def loss(self, params, td: TDict, key=None) -> TDict:
        # value: expectile regression toward target Q(s, a_data)
        q_data = jax.lax.stop_gradient(
            self._q_min(params["target_qvalue"], td)
        ).squeeze(-1)
        v = self.value(params["value"], td)["state_value"].squeeze(-1)
        loss_value = expectile_loss(q_data - v, self.expectile).mean()

        # qvalue: TD toward r + γ(1-term) V(s')
        next_td = td["next"]
        v_next = jax.lax.stop_gradient(
            self.value(params["value"], next_td)["state_value"]
        ).squeeze(-1)
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * v_next)
        qs = jax.vmap(lambda p: self.qvalue(p, td)[self.q_out_key])(
            params["qvalue"]
        ).squeeze(-1)
        loss_qvalue = distance_loss(qs, target[None], self.loss_function).mean()

        # actor: advantage-weighted regression
        adv = q_data - jax.lax.stop_gradient(v)
        weight = jnp.minimum(jnp.exp(self.temperature * adv), 100.0)
        dist, _ = self.actor.get_dist(params["actor"], td, key=key)
        log_prob = dist.log_prob(td["action"])
        loss_actor = -(jax.lax.stop_gradient(weight) * log_prob).mean()

        return TDict(
            loss_actor=loss_actor,
            loss_qvalue=loss_qvalue,
            loss_value=loss_value,
            td_error=jax.lax.stop_gradient(jnp.abs(qs - target[None]).max(0)),
        )


class DiscreteIQLLoss(IQLLoss):
    """Discrete-action IQL (reference iql.py:572): per-action Q heads."""

    def __init__(self, actor, qvalue, value, *, q_out_key: str = "action_value", **kw):
        super().__init__(actor, qvalue, value, q_out_key=q_out_key, **kw)

    def _q_min(self, q_params, td):
        qs = jax.vmap(lambda p: self.qvalue(p, td)[self.q_out_key])(q_params)
        q = jnp.min(qs, axis=0)
        action = jnp.asarray(td["action"], jnp.int32)
        return jnp.take_along_axis(q, action[..., None], axis=-1)

    def loss(self, params, td: TDict, key=None) -> TDict:
        q_data = jax.lax.stop_gradient(
            self._q_min(params["target_qvalue"], td)
        ).squeeze(-1)
        v = self.value(params["value"], td)["state_value"].squeeze(-1)
        loss_value = expectile_loss(q_data - v, self.expectile).mean()

        next_td = td["next"]
        v_next = jax.lax.stop_gradient(
            self.value(params["value"], next_td)["state_value"]
        ).squeeze(-1)
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * v_next)
        action = jnp.asarray(td["action"], jnp.int32)
        qs_all = jax.vmap(lambda p: self.qvalue(p, td)[self.q_out_key])(params["qvalue"])
        qs = jnp.take_along_axis(qs_all, action[None, ..., None], axis=-1).squeeze(-1)
        loss_qvalue = distance_loss(qs, target[None], self.loss_function).mean()

        adv = q_data - jax.lax.stop_gradient(v)
        weight = jnp.minimum(jnp.exp(self.temperature * adv), 100.0)
        dist, _ = self.actor.get_dist(params["actor"], td, key=key)
        log_prob = dist.log_prob(td["action"])
        loss_actor = -(jax.lax.stop_gradient(weight) * log_prob).mean()
        return TDict(
            loss_actor=loss_actor, loss_qvalue=loss_qvalue, loss_value=loss_value,
            td_error=jax.lax.stop_gradient(jnp.abs(qs - target[None]).max(0)),
        )
