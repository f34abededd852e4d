"""CrossQ objective (Bhatt et al. 2024 — SAC without target networks).

Counterpart of ``/root/reference/torchrl/objectives/crossq.py:40``: the TD
target uses the *online* critics evaluated in a joint forward pass over
``(s,a)`` and ``(s',a')`` so the critics' BatchRenorm statistics see both
distributions; no target params, no polyak.

The critic module must accept a ``train`` rng-free batch-stats mode: here we
pass a flax module whose ``apply`` uses mutable batch stats; the stats
pytree travels in ``params["qvalue_stats"]``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss, stack_params

__all__ = ["CrossQLoss"]


class CrossQLoss(LossModule):
    def __init__(self, actor, qvalue_module, *, num_qvalue_nets: int = 2,
                 gamma: float = 0.99, alpha_init: float = 1.0,
                 fixed_alpha: bool = False, target_entropy: float | str = "auto",
                 action_dim: int | None = None, loss_function: str = "l2"):
        self.actor = actor
        self.qvalue_module = qvalue_module  # flax module with batch_stats
        self.num_qvalue_nets = int(num_qvalue_nets)
        self.gamma = float(gamma)
        self.alpha_init = float(alpha_init)
        self.fixed_alpha = fixed_alpha
        self.loss_function = loss_function
        if target_entropy == "auto":
            if action_dim is None:
                raise ValueError("target_entropy='auto' needs action_dim")
            target_entropy = -float(action_dim)
        self.target_entropy = float(target_entropy)

    def init(self, key, td: TDict) -> TDict:
        ks = jax.random.split(key, self.num_qvalue_nets + 1)
        p_actor = self.actor.init(ks[0], td)
        td_a = self.actor(p_actor, td, key=ks[0])
        obs = jnp.asarray(td_a["observation"])
        act = jnp.asarray(td_a["action"])
        inits = [self.qvalue_module.init(k, obs, act, use_running_average=False)
                 for k in ks[1:]]
        p_q = stack_params([v["params"] for v in inits])
        stats = stack_params([v.get("batch_stats", {}) for v in inits])
        return TDict(
            actor=p_actor, qvalue=p_q, qvalue_stats=stats,
            log_alpha=jnp.asarray(math.log(self.alpha_init), jnp.float32),
        )

    @staticmethod
    def _plain(tree):
        return tree.to_dict() if isinstance(tree, TDict) else tree

    def _q_joint(self, params, stats, obs, act, obs2, act2):
        """Joint forward over both batches; returns (q1, q2, new_stats)."""
        params, stats = self._plain(params), self._plain(stats)
        n = obs.shape[0]
        obs_cat = jnp.concatenate([obs, obs2], axis=0)
        act_cat = jnp.concatenate([act, act2], axis=0)

        def one(p, s):
            out, muts = self.qvalue_module.apply(
                {"params": p, "batch_stats": s}, obs_cat, act_cat,
                use_running_average=False, mutable=["batch_stats"],
            )
            return out, muts["batch_stats"]

        qs, new_stats = jax.vmap(one)(params, stats)
        return qs[:, :n], qs[:, n:], new_stats

    def loss(self, params, td: TDict, key=None) -> TDict:
        k_actor, k_next = jax.random.split(key)
        alpha = jax.lax.stop_gradient(jnp.exp(params["log_alpha"]))
        obs = jnp.asarray(td["observation"])
        act = jnp.asarray(td["action"])
        next_td = td["next"]
        obs2 = jnp.asarray(next_td["observation"])

        next_dist, _ = self.actor.get_dist(
            jax.lax.stop_gradient(params["actor"]), next_td
        )
        a_next = next_dist.rsample(k_next)
        log_prob_next = next_dist.log_prob(a_next)

        q_data, q_next_all, new_stats = self._q_joint(
            params["qvalue"], params["qvalue_stats"], obs, act, obs2, a_next
        )
        q_next = jax.lax.stop_gradient(jnp.min(q_next_all, axis=0)).squeeze(-1)
        soft_v = q_next - alpha * log_prob_next
        reward = jnp.asarray(next_td["reward"], jnp.float32).squeeze(-1)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32).squeeze(-1)
        target = jax.lax.stop_gradient(reward + self.gamma * not_term * soft_v)
        qs = q_data.squeeze(-1)
        loss_qvalue = distance_loss(qs, target[None], self.loss_function).mean()

        # actor (running-average stats, no mutation)
        dist, _ = self.actor.get_dist(params["actor"], td)
        a_new = dist.rsample(k_actor)
        log_prob = dist.log_prob(a_new)

        def q_eval(p, s):
            return self.qvalue_module.apply(
                {"params": p, "batch_stats": s}, obs, a_new, use_running_average=True
            )

        q_pi = jnp.min(
            jax.vmap(q_eval)(
                jax.lax.stop_gradient(self._plain(params["qvalue"])),
                jax.lax.stop_gradient(self._plain(params["qvalue_stats"])),
            ),
            axis=0,
        ).squeeze(-1)
        loss_actor = (alpha * log_prob - q_pi).mean()

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
            new_qvalue_stats=new_stats,
        )

    def apply_stats(self, params: TDict, metrics: TDict) -> TDict:
        """Fold the mutated batch stats back into params after a step."""
        if "new_qvalue_stats" in metrics:
            return params.set("qvalue_stats", metrics["new_qvalue_stats"])
        return params
