"""CQL objectives (conservative offline RL).

Counterpart of ``/root/reference/torchrl/objectives/cql.py``: ``CQLLoss``
:37 (SAC base + conservative logsumexp penalty over sampled actions),
``DiscreteCQLLoss`` :996 (penalty in closed form over the action set).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss
from .dqn import DQNLoss
from .sac import SACLoss

__all__ = ["CQLLoss", "DiscreteCQLLoss"]


class CQLLoss(SACLoss):
    """SAC + conservative penalty:
    ``α_cql · (logsumexp_a Q(s,a) − Q(s, a_data))`` estimated with
    ``num_random`` uniform actions plus current/next policy actions
    (reference cql.py:37).
    """

    def __init__(self, actor, qvalue, *, action_low=-1.0, action_high=1.0,
                 cql_alpha: float = 1.0, num_random: int = 10,
                 with_lagrange: bool = False, lagrange_thresh: float = 10.0,
                 **sac_kwargs):
        super().__init__(actor, qvalue, **sac_kwargs)
        self.action_low = jnp.asarray(action_low)
        self.action_high = jnp.asarray(action_high)
        self.cql_alpha = float(cql_alpha)
        self.num_random = int(num_random)
        self.with_lagrange = with_lagrange
        self.lagrange_thresh = lagrange_thresh

    def init(self, key, td: TDict) -> TDict:
        params = super().init(key, td)
        if self.with_lagrange:
            params = params.set("log_alpha_prime", jnp.zeros((), jnp.float32))
        return params

    def loss(self, params, td: TDict, key=None) -> TDict:
        k_sac, k_rand, k_cur, k_next = jax.random.split(key, 4)
        out = super().loss(params, td, k_sac)

        # conservative penalty
        B = jnp.asarray(td["action"]).shape[0]
        act_dim = jnp.asarray(td["action"]).shape[-1]
        n = self.num_random

        def q_of(actions, obs_td):
            # actions: [n, B, act_dim] -> q: [n, B]
            def per_sample(a):
                return self._q_ensemble(params["qvalue"], obs_td.set("action", a)).squeeze(-1)

            return jax.vmap(per_sample)(actions)  # [n, N_critics, B]

        rand_actions = jax.random.uniform(
            k_rand, (n, B, act_dim), minval=self.action_low, maxval=self.action_high
        )
        dist, _ = self.actor.get_dist(jax.lax.stop_gradient(params["actor"]), td)
        cur_actions = dist.sample(k_cur, (n,))
        cur_logp = dist.log_prob(cur_actions)
        next_dist, _ = self.actor.get_dist(
            jax.lax.stop_gradient(params["actor"]), td["next"]
        )
        next_actions = next_dist.sample(k_next, (n,))
        next_logp = next_dist.log_prob(next_actions)

        q_rand = q_of(rand_actions, td)
        q_cur = q_of(cur_actions, td)
        q_next = q_of(next_actions, td)
        # importance-sampled logsumexp (reference mirrors CQL(H))
        log_u = -act_dim * math.log(2.0)  # log uniform density over [-1,1]^d scaled
        cat = jnp.concatenate(
            [
                q_rand - log_u,
                q_cur - jax.lax.stop_gradient(cur_logp)[:, None, :],
                q_next - jax.lax.stop_gradient(next_logp)[:, None, :],
            ],
            axis=0,
        )  # [3n, N_critics, B]
        lse = jax.scipy.special.logsumexp(cat, axis=0) - jnp.log(jnp.asarray(3 * n, jnp.float32))
        q_data = self._q_ensemble(params["qvalue"], td).squeeze(-1)
        gap = (lse - q_data).mean()

        if self.with_lagrange:
            alpha_prime = jnp.clip(jnp.exp(params["log_alpha_prime"]), 0.0, 1e6)
            loss_cql = alpha_prime * self.cql_alpha * (gap - self.lagrange_thresh)
            loss_alpha_prime = -loss_cql
            out = out.set("loss_alpha_prime", loss_alpha_prime)
            loss_cql = jax.lax.stop_gradient(alpha_prime) * self.cql_alpha * gap
        else:
            loss_cql = self.cql_alpha * gap
        out = out.set("loss_cql", loss_cql)
        out = out.set("cql_gap", jax.lax.stop_gradient(gap))
        return out


class DiscreteCQLLoss(DQNLoss):
    """DQN + closed-form conservative penalty
    ``logsumexp_a Q(s,a) − Q(s, a_data)`` (reference cql.py:996)."""

    def __init__(self, value_network, *, cql_alpha: float = 1.0, **dqn_kwargs):
        super().__init__(value_network, **dqn_kwargs)
        self.cql_alpha = float(cql_alpha)

    def loss(self, params, td: TDict, key=None) -> TDict:
        out = super().loss(params, td, key)
        q_all = self.value_network(params["value"], td)[self.action_value_key]
        action = jnp.asarray(td["action"], jnp.int32)
        q_data = jnp.take_along_axis(q_all, action[..., None], axis=-1).squeeze(-1)
        lse = jax.scipy.special.logsumexp(q_all, axis=-1)
        gap = (lse - q_data).mean()
        return out.set("loss_cql", self.cql_alpha * gap).set(
            "cql_gap", jax.lax.stop_gradient(gap)
        )
