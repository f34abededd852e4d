"""TD3+BC objective (offline RL; Fujimoto & Gu 2021).

Counterpart of ``/root/reference/torchrl/objectives/td3_bc.py:27``: TD3 with
a behaviour-cloning regularizer and λ-normalized actor objective.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .td3 import TD3Loss

__all__ = ["TD3BCLoss"]


class TD3BCLoss(TD3Loss):
    def __init__(self, actor, qvalue, *, alpha_bc: float = 2.5, **td3_kwargs):
        super().__init__(actor, qvalue, **td3_kwargs)
        self.alpha_bc = float(alpha_bc)

    def loss(self, params, td: TDict, key=None) -> TDict:
        out = super().loss(params, td, key)
        td_pi = self.actor(params["actor"], td)
        pi_action = jnp.asarray(td_pi["action"])
        q_pi = self.qvalue(
            jax.tree.map(lambda x: jax.lax.stop_gradient(x[0]), params["qvalue"]),
            td_pi,
        )[self.q_out_key]
        lmbda = self.alpha_bc / (jax.lax.stop_gradient(jnp.abs(q_pi).mean()) + 1e-8)
        bc = ((pi_action - jnp.asarray(td["action"])) ** 2).mean()
        loss_actor = -lmbda * q_pi.mean() + bc
        return out.set("loss_actor", loss_actor).set(
            "bc_loss", jax.lax.stop_gradient(bc)
        )
