"""DQN objectives.

Counterpart of ``/root/reference/torchrl/objectives/dqn.py``: ``DQNLoss``
:34 (double-DQN default), ``DistributionalDQNLoss`` :389 (C51).

``params = TDict(value=…, target_value=…)``; ``td_error`` is returned for
prioritized-replay updates (reference priority plumbing,
replay_buffers.py:2187).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss, make_target_params
from .value.functional import td0_return_estimate

__all__ = ["DQNLoss", "DistributionalDQNLoss"]


def _gather_action_values(q: jax.Array, action: jax.Array) -> jax.Array:
    """q: [..., n_actions]; action: int [...] or one-hot [..., n]."""
    action = jnp.asarray(action)
    if action.shape == q.shape:  # one-hot
        return jnp.sum(q * action.astype(q.dtype), axis=-1, keepdims=True)
    return jnp.take_along_axis(q, action[..., None].astype(jnp.int32), axis=-1)


class DQNLoss(LossModule):
    """TD(0) Q-learning with target network (reference dqn.py:34)."""

    def __init__(self, value_network, *, gamma: float = 0.99,
                 double_dqn: bool = False, loss_function: str = "l2",
                 action_value_key: str = "action_value"):
        self.value_network = value_network
        self.gamma = float(gamma)
        self.double_dqn = double_dqn
        self.loss_function = loss_function
        self.action_value_key = action_value_key

    def init(self, key, td: TDict) -> TDict:
        p = self.value_network.init(key, td)
        return TDict(value=p, target_value=make_target_params(p))

    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        td_q = self.value_network(params["value"], td)
        q_taken = _gather_action_values(td_q[self.action_value_key], td["action"])

        next_td = td["next"]
        q_next_target = self.value_network(params["target_value"], next_td)[
            self.action_value_key
        ]
        if self.double_dqn:
            q_next_online = self.value_network(params["value"], next_td)[
                self.action_value_key
            ]
            a_star = jnp.argmax(q_next_online, axis=-1)
            next_value = jnp.take_along_axis(
                q_next_target, a_star[..., None], axis=-1
            )
        else:
            next_value = jnp.max(q_next_target, axis=-1, keepdims=True)
        next_value = jax.lax.stop_gradient(next_value)

        target = td0_return_estimate(
            self.gamma, next_value, next_td["reward"], next_td["terminated"]
        )
        target = jax.lax.stop_gradient(target)
        td_error = q_taken - target
        loss = distance_loss(q_taken, target, self.loss_function)
        if "_weight" in td:  # prioritized IS weights
            w = jnp.asarray(td["_weight"]).reshape(
                loss.shape[:1] + (1,) * (loss.ndim - 1)
            )
            loss = loss * w
        return TDict(
            loss_qvalue=loss.mean(),
            td_error=jax.lax.stop_gradient(jnp.abs(td_error)),
            pred_value=jax.lax.stop_gradient(q_taken.mean()),
            target_value=jax.lax.stop_gradient(target.mean()),
        )


class DistributionalDQNLoss(LossModule):
    """C51 categorical DQN (Bellemare et al. 2017; reference dqn.py:389).

    ``value_network`` writes ``action_value_logits`` of shape
    ``[..., n_actions, n_atoms]``.
    """

    def __init__(self, value_network, *, gamma: float = 0.99,
                 v_min: float = -10.0, v_max: float = 10.0, n_atoms: int = 51,
                 logits_key: str = "action_value_logits"):
        self.value_network = value_network
        self.gamma = float(gamma)
        self.v_min = float(v_min)
        self.v_max = float(v_max)
        self.n_atoms = int(n_atoms)
        self.logits_key = logits_key

    @property
    def support(self):
        return jnp.linspace(self.v_min, self.v_max, self.n_atoms)

    def init(self, key, td: TDict) -> TDict:
        p = self.value_network.init(key, td)
        return TDict(value=p, target_value=make_target_params(p))

    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        z = self.support
        dz = (self.v_max - self.v_min) / (self.n_atoms - 1)

        logits = self.value_network(params["value"], td)[self.logits_key]
        action = jnp.asarray(td["action"], jnp.int32)
        logits_taken = jnp.take_along_axis(
            logits, action[..., None, None].astype(jnp.int32).repeat(self.n_atoms, -1),
            axis=-2,
        ).squeeze(-2)
        log_p_taken = jax.nn.log_softmax(logits_taken, axis=-1)

        next_td = td["next"]
        next_logits = self.value_network(params["target_value"], next_td)[self.logits_key]
        next_probs = jax.nn.softmax(next_logits, axis=-1)
        next_q = jnp.sum(next_probs * z, axis=-1)
        a_star = jnp.argmax(next_q, axis=-1)
        p_next = jnp.take_along_axis(
            next_probs, a_star[..., None, None].repeat(self.n_atoms, -1), axis=-2
        ).squeeze(-2)

        reward = jnp.asarray(next_td["reward"], jnp.float32)
        not_term = 1.0 - jnp.asarray(next_td["terminated"], jnp.float32)
        Tz = jnp.clip(reward + self.gamma * not_term * z, self.v_min, self.v_max)
        b = (Tz - self.v_min) / dz
        low = jnp.floor(b).astype(jnp.int32)
        high = jnp.ceil(b).astype(jnp.int32)
        # distribute probability mass to neighbouring atoms
        m = jnp.zeros_like(p_next)
        low_c = jnp.clip(low, 0, self.n_atoms - 1)
        high_c = jnp.clip(high, 0, self.n_atoms - 1)
        w_low = p_next * (jnp.ceil(b) - b + (low == high))
        w_high = p_next * (b - jnp.floor(b))

        def scatter(m, idx, w):
            one_hot = jax.nn.one_hot(idx, self.n_atoms, dtype=m.dtype)
            return m + jnp.sum(one_hot * w[..., None], axis=-2)

        m = scatter(m, low_c, w_low)
        m = scatter(m, high_c, w_high)
        m = jax.lax.stop_gradient(m)

        loss = -jnp.sum(m * log_p_taken, axis=-1)
        return TDict(loss_qvalue=loss.mean(), td_error=jax.lax.stop_gradient(loss))
