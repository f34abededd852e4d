"""REDQ objective (Randomized Ensembled Double Q; Chen et al. 2021).

Counterpart of ``/root/reference/torchrl/objectives/redq.py:32``: SAC-style
updates with a large critic ensemble (default 10) whose TD target takes the
min over a random subset (default 2) each step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import distance_loss
from .sac import SACLoss

__all__ = ["REDQLoss"]


class REDQLoss(SACLoss):
    def __init__(self, actor, qvalue, *, num_qvalue_nets: int = 10,
                 sub_sample_len: int = 2, **sac_kwargs):
        super().__init__(actor, qvalue, num_qvalue_nets=num_qvalue_nets, **sac_kwargs)
        self.sub_sample_len = int(sub_sample_len)

    def loss(self, params, td: TDict, key=None) -> TDict:
        k_actor, k_next, k_sub = jax.random.split(key, 3)
        alpha = jax.lax.stop_gradient(jnp.exp(params["log_alpha"]))

        # actor: mean over the FULL ensemble (reference REDQ)
        dist, _ = self.actor.get_dist(params["actor"], td)
        a_new = dist.rsample(k_actor)
        log_prob = dist.log_prob(a_new)
        q_held = jax.lax.stop_gradient(params["qvalue"])
        q_pi = self._q_ensemble(q_held, td.set("action", a_new)).mean(0).squeeze(-1)
        loss_actor = (alpha * log_prob - q_pi).mean()

        # critic: min over a random sub-sample of target critics
        next_td = td["next"]
        next_dist, _ = self.actor.get_dist(
            jax.lax.stop_gradient(params["actor"]), next_td
        )
        a_next = next_dist.rsample(k_next)
        log_prob_next = next_dist.log_prob(a_next)
        idx = jax.random.choice(
            k_sub, self.num_qvalue_nets, (self.sub_sample_len,), replace=False
        )
        sub_targets = jax.tree.map(lambda x: x[idx], params["target_qvalue"])
        q_next = jnp.min(
            self._q_ensemble(sub_targets, next_td.set("action", a_next)), axis=0
        ).squeeze(-1)
        soft_v = q_next - alpha * log_prob_next
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * soft_v)

        qs = self._q_ensemble(params["qvalue"], td).squeeze(-1)
        loss_qvalue = distance_loss(qs, target[None], self.loss_function).mean()

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
            td_error=jax.lax.stop_gradient(jnp.abs(qs - target[None]).max(0)),
        )
