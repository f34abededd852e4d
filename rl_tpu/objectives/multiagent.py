"""Multi-agent objectives.

Counterparts of ``/root/reference/torchrl/objectives/multiagent/``:
``QMixerLoss`` qmixer.py:34, ``MAPPOLoss``/``IPPOLoss`` mappo.py:83,213.

Key layout: per-agent keys under ``("agents", ...)`` (action, observation,
action_value); global reward/done at the root ``next``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss, make_target_params
from .ppo import ClipPPOLoss
from .value.functional import td0_return_estimate

__all__ = ["QMixerLoss", "MAPPOLoss", "IPPOLoss"]


class QMixerLoss(LossModule):
    """Mixed-Q TD learning (QMIX / VDN; reference qmixer.py:34).

    ``qnet``: callable ``(params, td) -> td`` writing per-agent
    ``("agents", "action_value")`` [..., n_agents, n_actions].
    ``mixer``: VDNMixer or QMixer mixing chosen per-agent Qs into a global Q,
    conditioned on ``state_key`` for QMixer.
    """

    def __init__(self, qnet, mixer, *, gamma: float = 0.99,
                 double_dqn: bool = False, loss_function: str = "l2",
                 action_key=("agents", "action"),
                 action_value_key=("agents", "action_value"),
                 state_key: str = "state"):
        self.qnet = qnet
        self.mixer = mixer
        self.gamma = float(gamma)
        self.double_dqn = double_dqn
        self.loss_function = loss_function
        self.action_key = action_key
        self.action_value_key = action_value_key
        self.state_key = state_key

    def _mixer_state(self, td: TDict):
        if self.state_key in td:
            return jnp.asarray(td[self.state_key])
        # default global state: concat agent observations
        obs = jnp.asarray(td["agents", "observation"])
        return obs.reshape(obs.shape[:-2] + (-1,))

    def init(self, key, td: TDict) -> TDict:
        k1, k2 = jax.random.split(key)
        p_q = self.qnet.init(k1, td)
        td_q = self.qnet(p_q, td)
        q = jnp.asarray(td_q[self.action_value_key])
        chosen = q[..., :1]
        p_m = self.mixer.init(k2, chosen, self._mixer_state(td))
        return TDict(
            qnet=p_q, mixer=p_m,
            target_qnet=make_target_params(p_q),
            target_mixer=make_target_params(p_m),
        )

    def _chosen_q(self, q: jax.Array, action: jax.Array) -> jax.Array:
        return jnp.take_along_axis(q, action[..., None].astype(jnp.int32), axis=-1)

    def loss(self, params, td: TDict, key=None) -> TDict:
        q_all = self.qnet(params["qnet"], td)[self.action_value_key]
        action = jnp.asarray(td[self.action_key], jnp.int32)
        chosen = self._chosen_q(q_all, action)  # [..., n_agents, 1]
        q_tot = self.mixer(params["mixer"], chosen, self._mixer_state(td))

        next_td = td["next"]
        q_next_target = self.qnet(params["target_qnet"], next_td)[self.action_value_key]
        if self.double_dqn:
            q_next_online = self.qnet(params["qnet"], next_td)[self.action_value_key]
            a_star = jnp.argmax(q_next_online, axis=-1)
        else:
            a_star = jnp.argmax(q_next_target, axis=-1)
        next_chosen = self._chosen_q(q_next_target, a_star)
        q_tot_next = self.mixer(
            params["target_mixer"], next_chosen, self._mixer_state(next_td)
        )
        q_tot_next = jax.lax.stop_gradient(q_tot_next)

        target = td0_return_estimate(
            self.gamma, q_tot_next, next_td["reward"], next_td["terminated"]
        )
        target = jax.lax.stop_gradient(target)
        td_error = q_tot - target
        return TDict(
            loss_qmix=distance_loss(q_tot, target, self.loss_function).mean(),
            td_error=jax.lax.stop_gradient(jnp.abs(td_error)),
            pred_value=jax.lax.stop_gradient(q_tot.mean()),
        )


class MAPPOLoss(ClipPPOLoss):
    """Centralized-critic PPO (reference mappo.py:83): per-agent actors with
    shared advantage from a critic that sees the global state.  Identical
    math to ClipPPOLoss — the multi-agent structure lives in the modules
    (MultiAgentMLP actor, centralized critic) and the grouped keys."""

    def __init__(self, actor, critic, *, log_prob_key=("agents", "sample_log_prob"),
                 **kwargs):
        super().__init__(actor, critic, log_prob_key=log_prob_key, **kwargs)


class IPPOLoss(ClipPPOLoss):
    """Independent-learner PPO (reference mappo.py:213): per-agent critics
    (decentralized); same loss arithmetic, per-agent keys."""

    def __init__(self, actor, critic, *, log_prob_key=("agents", "sample_log_prob"),
                 **kwargs):
        super().__init__(actor, critic, log_prob_key=log_prob_key, **kwargs)
