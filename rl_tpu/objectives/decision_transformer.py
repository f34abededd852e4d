"""Decision Transformer objectives.

Counterpart of ``/root/reference/torchrl/objectives/decision_transformer.py``:
``OnlineDTLoss`` :21 (stochastic policy, NLL + entropy with learned α),
``DTLoss`` :285 (deterministic, action MSE).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss

__all__ = ["DTLoss", "OnlineDTLoss"]


class DTLoss(LossModule):
    """Supervised action regression over trajectory windows
    (reference :285).  ``actor``: ``(params, td) -> td`` writing
    ``pred_action`` [B, T, A] from observation/action/return_to_go."""

    def __init__(self, actor, *, loss_function: str = "l2"):
        self.actor = actor
        self.loss_function = loss_function

    def init(self, key, td: TDict) -> TDict:
        return TDict(actor=self.actor.init(key, td))

    def loss(self, params, td: TDict, key=None) -> TDict:
        td_out = self.actor(params["actor"], td)
        pred = jnp.asarray(td_out["pred_action"])
        target = jax.lax.stop_gradient(jnp.asarray(td["action"]))
        loss = distance_loss(pred, target, self.loss_function)
        if "mask" in td:
            m = jnp.asarray(td["mask"], jnp.float32)
            m = m.reshape(m.shape + (1,) * (loss.ndim - m.ndim))
            loss = loss * m
            return TDict(
                loss_dt=loss.sum() / jnp.maximum(m.sum() * pred.shape[-1], 1.0)
            )
        return TDict(loss_dt=loss.mean())


class OnlineDTLoss(LossModule):
    """Stochastic DT with entropy regularization (reference :21).

    ``actor`` writes ``loc``/``scale`` [B, T, A]; α is a learned temperature
    with target entropy −action_dim.
    """

    def __init__(self, actor, *, alpha_init: float = 0.1,
                 target_entropy: float | str = "auto", action_dim: int | None = None):
        self.actor = actor
        self.alpha_init = float(alpha_init)
        if target_entropy == "auto":
            if action_dim is None:
                raise ValueError("target_entropy='auto' needs action_dim")
            target_entropy = -float(action_dim)
        self.target_entropy = float(target_entropy)

    def init(self, key, td: TDict) -> TDict:
        return TDict(
            actor=self.actor.init(key, td),
            log_alpha=jnp.asarray(math.log(self.alpha_init), jnp.float32),
        )

    def loss(self, params, td: TDict, key=None) -> TDict:
        td_out = self.actor(params["actor"], td)
        loc = jnp.asarray(td_out["loc"])
        scale = jnp.asarray(td_out["scale"])
        target = jax.lax.stop_gradient(jnp.asarray(td["action"]))
        # diagonal Gaussian NLL per (B, T)
        z = (target - loc) / scale
        log_prob = (-0.5 * z**2 - jnp.log(scale) - 0.5 * math.log(2 * math.pi)).sum(-1)
        entropy = (0.5 + 0.5 * math.log(2 * math.pi) + jnp.log(scale)).sum(-1)
        if "mask" in td:
            m = jnp.asarray(td["mask"], jnp.float32)
            denom = jnp.maximum(m.sum(), 1.0)
            nll = -(log_prob * m).sum() / denom
            ent = (entropy * m).sum() / denom
        else:
            nll = -log_prob.mean()
            ent = entropy.mean()
        alpha = jax.lax.stop_gradient(jnp.exp(params["log_alpha"]))
        loss_log_likelihood = nll
        loss_entropy = -alpha * ent
        loss_alpha = params["log_alpha"] * jax.lax.stop_gradient(
            ent - self.target_entropy
        )
        return TDict(
            loss_log_likelihood=loss_log_likelihood,
            loss_entropy=loss_entropy,
            loss_alpha=loss_alpha,
            entropy=jax.lax.stop_gradient(ent),
            alpha=alpha,
        )
