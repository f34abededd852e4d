"""DDPG objective (reference ``/root/reference/torchrl/objectives/ddpg.py:27``).

``params = TDict(actor=…, qvalue=…, target_actor=…, target_qvalue=…)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss, make_target_params

__all__ = ["DDPGLoss"]


class DDPGLoss(LossModule):
    def __init__(self, actor, qvalue, *, gamma: float = 0.99,
                 loss_function: str = "l2", q_out_key: str = "state_action_value"):
        self.actor = actor  # deterministic: writes "action"
        self.qvalue = qvalue
        self.gamma = float(gamma)
        self.loss_function = loss_function
        self.q_out_key = q_out_key

    def init(self, key, td: TDict) -> TDict:
        k1, k2 = jax.random.split(key)
        p_a = self.actor.init(k1, td)
        td_a = self.actor(p_a, td)
        p_q = self.qvalue.init(k2, td_a)
        return TDict(
            actor=p_a, qvalue=p_q,
            target_actor=make_target_params(p_a),
            target_qvalue=make_target_params(p_q),
        )

    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        # actor: maximize Q(s, π(s)) with critic held out
        td_pi = self.actor(params["actor"], td)
        q_pi = self.qvalue(jax.lax.stop_gradient(params["qvalue"]), td_pi)[self.q_out_key]
        loss_actor = -q_pi.mean()

        # critic: TD(0) with target nets
        next_td = td["next"]
        next_pi = self.actor(params["target_actor"], next_td)
        q_next = self.qvalue(params["target_qvalue"], next_pi)[self.q_out_key].squeeze(-1)
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * q_next)
        q = self.qvalue(params["qvalue"], td)[self.q_out_key].squeeze(-1)
        loss_value = distance_loss(q, target, self.loss_function).mean()
        return TDict(
            loss_actor=loss_actor,
            loss_value=loss_value,
            td_error=jax.lax.stop_gradient(jnp.abs(q - target)),
            pred_value=jax.lax.stop_gradient(q.mean()),
        )
