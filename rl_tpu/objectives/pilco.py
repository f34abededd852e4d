"""PILCO: policy search through a GP dynamics model.

Counterpart of ``/root/reference/torchrl/objectives/pilco.py``
(``ExponentialQuadraticCost`` :8) plus the PILCO planning loop the
reference assembles from ``GPWorldModel.uncertain_forward`` — here a
single differentiable ``PILCOLoss`` that propagates the state belief
through GP dynamics (unscented transform) and accumulates the expected
saturating cost, all under ``lax.scan``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule

__all__ = ["ExponentialQuadraticCost", "PILCOLoss"]


class ExponentialQuadraticCost(LossModule):
    """Expected saturating cost of a Gaussian state belief
    (reference pilco.py:8; Deisenroth & Rasmussen 2011 eq. 24-25):

    ``E[c] = 1 − |I + S W|^{-1/2} exp(−½ (m−t)ᵀ W (I + S W)^{-1} (m−t))``
    """

    def __init__(self, target=None, weights=None):
        self.target = target
        self.weights = weights

    def expected_cost(self, m, S):
        m = jnp.asarray(m, jnp.float32)
        D = m.shape[-1]
        t = (jnp.zeros(D) if self.target is None
             else jnp.asarray(self.target, jnp.float32))
        W = (jnp.eye(D) if self.weights is None
             else jnp.asarray(self.weights, jnp.float32))
        S = jnp.asarray(S, jnp.float32)
        A = jnp.eye(D) + S @ W
        diff = m - t
        sol = jnp.linalg.solve(A, diff)
        quad = diff @ (W @ sol)
        det = jnp.linalg.det(A)
        return 1.0 - jnp.exp(-0.5 * quad) / jnp.sqrt(jnp.abs(det) + 1e-12)

    def loss(self, params, td: TDict, key=None) -> TDict:
        m = jnp.asarray(td["observation", "mean"])
        S_in = td["observation", "var"]
        S = jnp.asarray(S_in)
        if S.ndim == m.ndim:  # diagonal variance given
            S = jax.vmap(jnp.diag)(S.reshape(-1, S.shape[-1])).reshape(
                S.shape[:-1] + (S.shape[-1], S.shape[-1])
            ) if m.ndim > 1 else jnp.diag(S)
        if m.ndim == 1:
            cost = self.expected_cost(m, S)
        else:
            cost = jax.vmap(self.expected_cost)(
                m.reshape(-1, m.shape[-1]),
                S.reshape(-1, m.shape[-1], m.shape[-1]),
            ).mean()
        return TDict(loss_cost=cost)


class PILCOLoss(LossModule):
    """Differentiable PILCO objective: sum of expected saturating costs
    along a belief rollout through the fitted GP dynamics.

    ``gp``: a fitted :class:`rl_tpu.modules.gp.GPWorldModel`;
    ``controller``: an :class:`rl_tpu.modules.gp.RBFController` (or any
    ``(params, state) -> action``); ``params`` passed to ``loss`` are the
    controller parameters — gradients flow through the GP posterior and
    the unscented transform.
    """

    def __init__(self, gp, controller, cost: ExponentialQuadraticCost, *,
                 horizon: int = 20):
        self.gp = gp
        self.controller = controller
        self.cost = cost
        self.horizon = horizon

    def loss(self, params, td: TDict, key=None) -> TDict:
        m0 = jnp.asarray(td["observation"], jnp.float32)
        if m0.ndim > 1:
            m0 = m0[0]
        D = m0.shape[-1]
        S0 = 1e-4 * jnp.eye(D)

        def policy(s):
            return jnp.atleast_2d(
                self.controller(params, s)
            )[0]

        def body(carry, _):
            m, S = carry
            m, S = self.gp.propagate(m, S, policy)
            return (m, S), self.cost.expected_cost(m, S)

        (_, _), costs = jax.lax.scan(
            body, (m0, S0), None, length=self.horizon
        )
        return TDict(loss_pilco=costs.sum(),
                     mean_step_cost=jax.lax.stop_gradient(costs.mean()))
