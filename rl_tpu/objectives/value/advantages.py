"""Value estimator classes over TDict trajectories.

Counterparts of the reference estimator hierarchy
(``/root/reference/torchrl/objectives/value/advantages.py``:
``ValueEstimatorBase`` :99, ``TD0Estimator`` :951, ``TD1Estimator`` :1234,
``TDLambdaEstimator`` :1530, ``GAE`` :1860, ``VTrace`` :2473).

Each estimator reads a **time-first** trajectory TDict (layout produced by
``Env.rollout``/the collector: root keys at t + ``("next", ...)``), runs the
value network on root and next observations, and writes ``advantage`` and
``value_target``.  The value net is a TDModule-style callable
``(params, td) -> td`` writing ``state_value``.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from . import functional as F

__all__ = ["ValueEstimatorBase", "TD0Estimator", "TD1Estimator", "MultiAgentGAE",
           "TDLambdaEstimator", "GAE", "VTrace"]


class ValueEstimatorBase:
    advantage_key = "advantage"
    value_target_key = "value_target"
    value_key = "state_value"

    def __init__(self, gamma: float, value_network=None, *,
                 differentiable: bool = False, time_dim: int = 0):
        self.gamma = float(gamma)
        self.value_network = value_network
        self.differentiable = differentiable
        if time_dim != 0:
            raise NotImplementedError("estimators are time-first (time_dim=0)")

    # -- plumbing -----------------------------------------------------------
    def _values(self, params, td: TDict):
        """Return (V(s_t), V(s_{t+1})) over the trajectory."""
        if self.value_key in td and (("next",) + (self.value_key,)) in td:
            return td[self.value_key], td["next", self.value_key]
        if self.value_network is None:
            raise RuntimeError(
                f"no value_network and no precomputed {self.value_key}"
            )
        td_v = self.value_network(params, td)
        td_next_v = self.value_network(params, td["next"])
        v = td_v[self.value_key]
        v_next = td_next_v[self.value_key]
        if not self.differentiable:
            v = jax.lax.stop_gradient(v)
            v_next = jax.lax.stop_gradient(v_next)
        return v, v_next

    def _flags(self, td: TDict):
        return td["next", "reward"], td["next", "done"], td["next", "terminated"]

    def __call__(self, params, td: TDict) -> TDict:
        adv, target = self.estimate(params, td)
        return td.set(self.advantage_key, adv).set(self.value_target_key, target)

    def estimate(self, params, td: TDict):
        raise NotImplementedError


class TD0Estimator(ValueEstimatorBase):
    """Reference advantages.py:951."""

    def estimate(self, params, td):
        v, v_next = self._values(params, td)
        reward, done, terminated = self._flags(td)
        target = F.td0_return_estimate(self.gamma, v_next, reward, terminated)
        return target - v, target


class TD1Estimator(ValueEstimatorBase):
    """Reference advantages.py:1234."""

    def __init__(self, gamma, value_network=None, *, vectorized=True, **kw):
        super().__init__(gamma, value_network, **kw)
        self.vectorized = vectorized

    def estimate(self, params, td):
        v, v_next = self._values(params, td)
        reward, done, terminated = self._flags(td)
        target = F.td1_return_estimate(
            self.gamma, v_next, reward, done, terminated, vectorized=self.vectorized
        )
        return target - v, target


class TDLambdaEstimator(ValueEstimatorBase):
    """Reference advantages.py:1530."""

    def __init__(self, gamma, lmbda: float = 0.95, value_network=None, *,
                 vectorized=True, **kw):
        super().__init__(gamma, value_network, **kw)
        self.lmbda = float(lmbda)
        self.vectorized = vectorized

    def estimate(self, params, td):
        v, v_next = self._values(params, td)
        reward, done, terminated = self._flags(td)
        target = F.td_lambda_return_estimate(
            self.gamma, self.lmbda, v_next, reward, done, terminated,
            vectorized=self.vectorized,
        )
        return target - v, target


class GAE(ValueEstimatorBase):
    """Generalized advantage estimation (reference advantages.py:1860).

    ``vectorized=True`` uses the log-depth associative-scan kernel (the
    reference's closed-form cumsum path); both agree bitwise in tests.
    """

    def __init__(self, gamma, lmbda: float = 0.95, value_network=None, *,
                 average_gae: bool = False, vectorized: bool = True,
                 shifted: bool = False, **kw):
        super().__init__(gamma, value_network, **kw)
        self.lmbda = float(lmbda)
        self.average_gae = average_gae
        self.vectorized = vectorized
        # reference `shifted` mode (advantages.py:1883): when the collector
        # already wrote V(s_t) per step, derive V(s_{t+1}) by shifting
        # instead of a second full critic pass — one critic call on the
        # final next-state only.  At auto-reset rows the shifted value is
        # the RESET state's (as in the reference); `terminated` gates the
        # bootstrap there, so only mid-batch truncations see the
        # approximation.
        self.shifted = shifted

    def _values_shifted(self, params, td):
        v = jnp.asarray(td[self.value_key])
        last_next = td["next"].apply(lambda x: x[-1])
        v_last = self.value_network(params, last_next)[self.value_key]
        v_next = jnp.concatenate([v[1:], v_last[None]], axis=0)
        if not self.differentiable:
            v = jax.lax.stop_gradient(v)
            v_next = jax.lax.stop_gradient(v_next)
        return v, v_next

    def estimate(self, params, td):
        if (self.shifted and self.value_network is not None
                and self.value_key in td):
            v, v_next = self._values_shifted(params, td)
        else:
            v, v_next = self._values(params, td)
        reward, done, terminated = self._flags(td)
        adv, target = F.generalized_advantage_estimate(
            self.gamma, self.lmbda, v, v_next, reward, done, terminated,
            vectorized=self.vectorized,
        )
        if self.average_gae:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        return adv, target


class VTrace(ValueEstimatorBase):
    """IMPALA off-policy correction (reference advantages.py:2473).

    Needs behaviour log-probs under ``sample_log_prob`` and an actor to
    compute target-policy log-probs (``actor.log_prob(params_actor, td)``).
    """

    def __init__(self, gamma, value_network=None, actor=None, *,
                 rho_thresh: float = 1.0, c_thresh: float = 1.0,
                 log_prob_key="sample_log_prob", **kw):
        super().__init__(gamma, value_network, **kw)
        self.actor = actor
        self.rho_thresh = rho_thresh
        self.c_thresh = c_thresh
        self.log_prob_key = log_prob_key

    def estimate(self, params, td, params_actor=None, log_pi=None):
        v, v_next = self._values(params, td)
        reward, done, terminated = self._flags(td)
        log_mu = td[self.log_prob_key]
        if log_pi is None:
            if self.actor is None or params_actor is None:
                log_pi = log_mu  # on-policy fallback
            else:
                log_pi = jax.lax.stop_gradient(
                    self.actor.log_prob(params_actor, td)
                )
        return F.vtrace_advantage_estimate(
            self.gamma, log_pi, log_mu, v, v_next, reward, done, terminated,
            self.rho_thresh, self.c_thresh,
        )


class MultiAgentGAE(GAE):
    """GAE over grouped (multi-agent) keys (reference advantages.py:2367).

    Reads per-agent values/rewards under a ``group`` prefix (default
    ``"agents"``): values at ``(group, "state_value")``, step results at
    ``("next", group, ...)``.  Team-shared reward/done signals that lack the
    agent dim are broadcast across it (reference ``_broadcast_signals``
    advantages.py:2252), and advantage normalization is per-agent rather
    than global (reference ``_normalize_advantage`` :2272).

    The scan kernel itself is the standard one: extra agent dims ride along
    as batch dims of `lax.associative_scan`.
    """

    def __init__(self, gamma, lmbda: float = 0.95, value_network=None, *,
                 group: str = "agents", **kw):
        super().__init__(gamma, lmbda, value_network, **kw)
        self.group = group

    def _values(self, params, td: TDict):
        key = (self.group, self.value_key)
        if key in td and (("next",) + key) in td:
            return td[key], td[("next",) + key]
        return super()._values(params, td)

    def _flags(self, td: TDict):
        nxt = td["next"]
        group_td = nxt[self.group] if self.group in nxt else nxt
        reward = group_td["reward"] if "reward" in group_td else nxt["reward"]
        done = group_td["done"] if "done" in group_td else nxt["done"]
        terminated = (
            group_td["terminated"] if "terminated" in group_td
            else nxt["terminated"]
        )
        # Broadcast team-shared [T, B, 1] signals across the agent dim of
        # per-agent values [T, B, n_agents, 1].
        if self.group in td:
            ref = td[self.group, self.value_key] if (
                (self.group, self.value_key) in td
            ) else None
            if ref is not None:
                reward = jnp.broadcast_to(
                    jnp.expand_dims(reward, -2) if reward.ndim < ref.ndim
                    else reward, ref.shape
                )
                done = jnp.broadcast_to(
                    jnp.expand_dims(done, -2) if done.ndim < ref.ndim
                    else done, ref.shape
                )
                terminated = jnp.broadcast_to(
                    jnp.expand_dims(terminated, -2)
                    if terminated.ndim < ref.ndim else terminated, ref.shape
                )
        return reward, done, terminated

    def estimate(self, params, td):
        v, v_next = self._values(params, td)
        reward, done, terminated = self._flags(td)
        adv, target = F.generalized_advantage_estimate(
            self.gamma, self.lmbda, v, v_next, reward, done, terminated,
            vectorized=self.vectorized,
        )
        if self.average_gae:
            # per-agent standardization: reduce over time+batch, keep agents
            axes = tuple(range(adv.ndim - 2)) + (adv.ndim - 1,)
            loc = adv.mean(axis=axes, keepdims=True)
            scale = adv.std(axis=axes, keepdims=True) + 1e-8
            adv = (adv - loc) / scale
        return adv, target

    def __call__(self, params, td: TDict) -> TDict:
        adv, target = self.estimate(params, td)
        return (
            td.set((self.group, self.advantage_key), adv)
              .set((self.group, self.value_target_key), target)
        )
