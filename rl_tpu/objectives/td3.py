"""TD3 objective (reference ``/root/reference/torchrl/objectives/td3.py:27``).

Twin critics, target-policy smoothing, delayed actor updates (the delay is
trainer cadence: step the actor parameters every ``policy_delay`` critic
steps — both losses are always returned).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss, make_target_params, stack_params

__all__ = ["TD3Loss"]


class TD3Loss(LossModule):
    def __init__(
        self,
        actor,
        qvalue,
        *,
        action_low,
        action_high,
        num_qvalue_nets: int = 2,
        gamma: float = 0.99,
        policy_noise: float = 0.2,
        noise_clip: float = 0.5,
        loss_function: str = "l2",
        q_out_key: str = "state_action_value",
    ):
        self.actor = actor
        self.qvalue = qvalue
        self.num_qvalue_nets = int(num_qvalue_nets)
        self.gamma = float(gamma)
        self.policy_noise = float(policy_noise)
        self.noise_clip = float(noise_clip)
        self.loss_function = loss_function
        self.q_out_key = q_out_key
        self.action_low = jnp.asarray(action_low)
        self.action_high = jnp.asarray(action_high)

    def init(self, key, td: TDict) -> TDict:
        ks = jax.random.split(key, self.num_qvalue_nets + 1)
        p_a = self.actor.init(ks[0], td)
        td_a = self.actor(p_a, td)
        p_q = stack_params([self.qvalue.init(k, td_a) for k in ks[1:]])
        return TDict(
            actor=p_a, qvalue=p_q,
            target_actor=make_target_params(p_a),
            target_qvalue=make_target_params(p_q),
        )

    def _q_ensemble(self, q_params, td):
        return jax.vmap(lambda p: self.qvalue(p, td)[self.q_out_key])(q_params)

    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        # actor: maximize Q1(s, π(s))
        td_pi = self.actor(params["actor"], td)
        q_pi = self.qvalue(
            jax.tree.map(lambda x: jax.lax.stop_gradient(x[0]), params["qvalue"]),
            td_pi,
        )[self.q_out_key]
        loss_actor = -q_pi.mean()

        # critics with smoothed target actions
        next_td = td["next"]
        next_pi = self.actor(params["target_actor"], next_td)
        noise = jnp.clip(
            jax.random.normal(key, jnp.asarray(next_pi["action"]).shape)
            * self.policy_noise,
            -self.noise_clip,
            self.noise_clip,
        )
        a_next = jnp.clip(
            jnp.asarray(next_pi["action"]) + noise, self.action_low, self.action_high
        )
        q_next = jnp.min(
            self._q_ensemble(params["target_qvalue"], next_td.set("action", a_next)),
            axis=0,
        ).squeeze(-1)
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * q_next)

        qs = self._q_ensemble(params["qvalue"], td).squeeze(-1)  # [N, B]
        loss_qvalue = distance_loss(qs, target[None], self.loss_function).mean()
        return TDict(
            loss_actor=loss_actor,
            loss_qvalue=loss_qvalue,
            td_error=jax.lax.stop_gradient(jnp.abs(qs - target[None]).max(axis=0)),
            pred_value=jax.lax.stop_gradient(qs.mean()),
        )
