"""Behaviour-cloning and GAIL objectives.

Counterparts of ``/root/reference/torchrl/objectives/bc.py:23`` (``BCLoss``)
and ``gail.py:19`` (``GAILLoss``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss

__all__ = ["BCLoss", "GAILLoss"]


class BCLoss(LossModule):
    """Supervised policy cloning: NLL for stochastic actors, MSE for
    deterministic (reference bc.py:23)."""

    def __init__(self, actor, *, loss_function: str = "l2"):
        self.actor = actor
        self.loss_function = loss_function
        self._probabilistic = hasattr(actor, "get_dist")

    def init(self, key, td: TDict) -> TDict:
        return TDict(actor=self.actor.init(key, td))

    def loss(self, params, td: TDict, key=None) -> TDict:
        if self._probabilistic:
            dist, _ = self.actor.get_dist(params["actor"], td, key=key)
            nll = -dist.log_prob(td["action"]).mean()
            return TDict(loss_bc=nll)
        td_pi = self.actor(params["actor"], td, key=key)
        mse = distance_loss(td_pi["action"], td["action"], self.loss_function).mean()
        return TDict(loss_bc=mse)


class GAILLoss(LossModule):
    """Adversarial imitation discriminator (reference gail.py:19).

    ``discriminator``: TDModule reading (observation, action) → ``d_logits``.
    The surrogate reward for the policy is ``-log(1 - D)`` (``use_grad_penalty``
    adds the WGAN-GP-style penalty).
    """

    def __init__(self, discriminator, *, use_grad_penalty: bool = False,
                 gp_lambda: float = 10.0):
        self.discriminator = discriminator
        self.use_grad_penalty = use_grad_penalty
        self.gp_lambda = float(gp_lambda)

    def init(self, key, td: TDict) -> TDict:
        return TDict(discriminator=self.discriminator.init(key, td))

    def loss(self, params, collection_td: TDict, expert_td: TDict | None = None,
             key=None) -> TDict:
        if expert_td is None:
            raise ValueError("GAILLoss.loss needs expert_td")
        d_pi = self.discriminator(params["discriminator"], collection_td)["d_logits"]
        d_exp = self.discriminator(params["discriminator"], expert_td)["d_logits"]
        # D -> 1 on expert, 0 on policy
        loss_d = (
            -jax.nn.log_sigmoid(d_exp).mean() - jax.nn.log_sigmoid(-d_pi).mean()
        )
        out = TDict(loss_discriminator=loss_d)
        if self.use_grad_penalty and key is not None:
            eps = jax.random.uniform(key, (jnp.asarray(expert_td["observation"]).shape[0], 1))
            mix = TDict(
                observation=eps * jnp.asarray(expert_td["observation"])
                + (1 - eps) * jnp.asarray(collection_td["observation"]),
                action=eps * jnp.asarray(expert_td["action"])
                + (1 - eps) * jnp.asarray(collection_td["action"]),
            )

            def d_of(obs, act):
                return self.discriminator(
                    params["discriminator"], TDict(observation=obs, action=act)
                )["d_logits"].sum()

            g_obs, g_act = jax.grad(d_of, argnums=(0, 1))(
                mix["observation"], mix["action"]
            )
            gnorm = jnp.sqrt(
                (g_obs**2).sum(-1) + (g_act**2).sum(-1) + 1e-12
            )
            out = out.set("gp", self.gp_lambda * ((gnorm - 1.0) ** 2).mean())
            out = out.set("loss_gp", out["gp"])
        return out

    def __call__(self, params, collection_td, expert_td=None, key=None):
        metrics = self.loss(params, collection_td, expert_td, key)
        total = sum(
            v for k, v in metrics.items(include_nested=True, leaves_only=True)
            if isinstance(k, str) and k.startswith("loss_")
        )
        return total, metrics

    def reward(self, params, td: TDict) -> jax.Array:
        """Surrogate reward −log(1 − D) for the policy's transitions."""
        d = self.discriminator(params["discriminator"], td)["d_logits"]
        return -jax.nn.log_sigmoid(-d)
