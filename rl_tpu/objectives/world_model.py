"""Generic world-model loss.

Counterpart of the reference ``WorldModelLoss``
(``/root/reference/torchrl/objectives/world_model_loss.py:19``): evaluates a
:class:`rl_tpu.modules.WorldModel` on a batch of real transitions and returns
one named sub-loss per active term — any subset of ``reward`` / ``done`` /
``reconstruction`` / ``latent`` — each weighted and computed with a
configurable :func:`distance_loss`.

The ground-truth reward/done are read from the input TDict before the model
runs, so the model can freely write its predictions under
``("next", "reward")`` / ``("next", "done")`` (the reference renames them to
``("next", "true_reward")`` etc.; functionally identical here since TDicts
are immutable values).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule, distance_loss

__all__ = ["WorldModelLoss"]

_VALID = ("reward", "done", "reconstruction", "latent")


class WorldModelLoss(LossModule):
    """``loss(params, td)`` over a :class:`~rl_tpu.modules.WorldModel`.

    Args:
        world_model: a :class:`rl_tpu.modules.WorldModel` (or any object with
            ``__call__(params, td, key) -> td`` writing prediction keys).
        losses: subset of ``["reward", "done", "reconstruction", "latent"]``.
        reward_loss / done_loss / reconstruction_loss / latent_loss: distance
            function names (``"l1"`` / ``"l2"`` / ``"smooth_l1"``).
        *_weight: scalar weights on each sub-loss.
        reconstruction_key: key of the decoder output (default
            ``"reco_observation"`` falling back to ``"observation"`` under
            next).
        latent_key / target_latent_key: predicted vs target next-latent keys
            for the deterministic-latent term.
    """

    def __init__(
        self,
        world_model,
        *,
        losses: Sequence[str] = ("reward",),
        reward_loss: str = "l2",
        done_loss: str = "l2",
        reconstruction_loss: str = "l2",
        latent_loss: str = "l2",
        reward_weight: float = 1.0,
        done_weight: float = 1.0,
        reconstruction_weight: float = 1.0,
        latent_weight: float = 1.0,
        reconstruction_key="reco_observation",
        latent_key=("next", "latent"),
        target_latent_key=("next", "target_latent"),
    ):
        for l in losses:
            if l not in _VALID:
                raise ValueError(f"unknown loss {l!r}; valid: {_VALID}")
        self.world_model = world_model
        self.losses = tuple(losses)
        self.loss_fns = {
            "reward": reward_loss,
            "done": done_loss,
            "reconstruction": reconstruction_loss,
            "latent": latent_loss,
        }
        self.weights = {
            "reward": reward_weight,
            "done": done_weight,
            "reconstruction": reconstruction_weight,
            "latent": latent_weight,
        }
        self.reconstruction_key = reconstruction_key
        self.latent_key = latent_key
        self.target_latent_key = target_latent_key

    def init(self, key, td: TDict) -> TDict:
        return self.world_model.init(key, td)

    def loss(self, params, td: TDict, key=None) -> TDict:
        true_reward = td.get(("next", "reward"), None)
        true_done = td.get(("next", "done"), None)
        true_obs = td.get(("next", "observation"), td.get("observation", None))
        true_latent = td.get(self.target_latent_key, None)

        out = self.world_model(params, td, key)
        nxt = out.get("next", out)

        metrics = TDict()
        if "reward" in self.losses:
            pred = jnp.asarray(nxt["reward"])
            metrics = metrics.set(
                "loss_reward",
                self.weights["reward"] * distance_loss(
                    pred, jnp.asarray(true_reward),
                    self.loss_fns["reward"]).mean(),
            )
        if "done" in self.losses:
            pred = jnp.asarray(nxt["done"]).astype(jnp.float32)
            metrics = metrics.set(
                "loss_done",
                self.weights["done"] * distance_loss(
                    pred, jnp.asarray(true_done).astype(jnp.float32),
                    self.loss_fns["done"]).mean(),
            )
        if "reconstruction" in self.losses:
            reco = out.get(self.reconstruction_key,
                           nxt.get(self.reconstruction_key, None))
            if reco is None:
                raise KeyError(
                    f"decoder output {self.reconstruction_key!r} not found")
            metrics = metrics.set(
                "loss_reconstruction",
                self.weights["reconstruction"] * distance_loss(
                    jnp.asarray(reco), jnp.asarray(true_obs),
                    self.loss_fns["reconstruction"]).mean(),
            )
        if "latent" in self.losses:
            pred = jnp.asarray(out[self.latent_key])
            target = jax.lax.stop_gradient(jnp.asarray(
                true_latent if true_latent is not None
                else out[self.target_latent_key]))
            metrics = metrics.set(
                "loss_latent",
                self.weights["latent"] * distance_loss(
                    pred, target, self.loss_fns["latent"]).mean(),
            )
        return metrics
