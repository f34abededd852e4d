"""Loss-module infrastructure.

Counterpart of the reference objective plumbing
(``/root/reference/torchrl/objectives/common.py``: ``LossModule`` :77,
``convert_to_functional`` :341, target-param cloning :496, vmap critic
ensembles :909; ``utils.py``: ``SoftUpdate`` :531, ``HardUpdate`` :590).

In the functional design all of that collapses:

* "convert_to_functional" is the default state — params are explicit pytrees;
* target networks are **pytree copies**; Polyak updates are ``tree.map``;
* N-critic ensembles are ``jax.vmap`` over stacked param pytrees.

A loss is ``(params, td, key) -> (total_loss, metrics_tdict)`` with
``loss_*`` metric keys summing to the total (reference convention).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict

__all__ = [
    "LossModule",
    "SoftUpdate",
    "HardUpdate",
    "make_target_params",
    "vmap_ensemble",
    "stack_params",
    "hold_out",
    "distance_loss",
]


class LossModule:
    """Base class for losses.  Subclasses implement ``loss(params, td, key)``
    returning a metrics TDict whose ``loss_*`` entries sum to the total."""

    def init(self, key, td: TDict) -> TDict:
        raise NotImplementedError

    def loss(self, params: TDict, td: TDict, key=None) -> TDict:
        raise NotImplementedError

    def __call__(self, params: TDict, td: TDict, key=None):
        metrics = self.loss(params, td, key)
        total = sum(
            v
            for k, v in metrics.items(include_nested=True, leaves_only=True)
            if isinstance(k, str) and k.startswith("loss_")
        )
        return total, metrics


def make_target_params(params: TDict) -> TDict:
    """Detached clone of the online params (reference common.py:496).

    A REAL copy, not an alias: immutability makes aliasing semantically
    safe, but donated training loops would then donate the same buffer
    twice (online + target leaf) and XLA rejects that at execute time."""
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.array(jax.lax.stop_gradient(x),
                                            copy=True), params)


class SoftUpdate:
    """Polyak averaging of target params (reference utils.py:531)."""

    def __init__(self, tau: float = 0.005, eps: float | None = None):
        if eps is not None:
            tau = 1.0 - eps
        self.tau = float(tau)

    def __call__(self, target_params, online_params):
        tau = self.tau
        return jax.tree.map(
            lambda t, o: (1.0 - tau) * t + tau * o, target_params, online_params
        )

    step = __call__


class HardUpdate:
    """Periodic full copy (reference utils.py:590). The cadence is driven by
    the trainer (``value_network_update_interval``); this just copies."""

    def __init__(self, value_network_update_interval: int = 1000):
        self.interval = int(value_network_update_interval)

    def __call__(self, target_params, online_params):
        return jax.tree.map(lambda t, o: o, target_params, online_params)

    step = __call__


def stack_params(param_list) -> TDict:
    """Stack N same-structure param pytrees along a new leading axis
    (the reference's expanded TensorDictParams for critic ensembles,
    common.py:441-468)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def vmap_ensemble(fn: Callable, n: int | None = None):
    """vmap a ``(params, *args)`` fn over stacked params (reference
    ``_make_vmap`` common.py:909)."""
    return jax.vmap(fn, in_axes=(0,) + (None,) * 1, out_axes=0)


def hold_out(params: TDict) -> TDict:
    """Gradient-stopped view (reference ``hold_out_net`` utils.py:626)."""
    return jax.tree.map(jax.lax.stop_gradient, params)


def distance_loss(x, y, loss_function: str = "l2"):
    """Pointwise regression losses (reference utils.py distance_loss)."""
    diff = jnp.asarray(x, jnp.float32) - jnp.asarray(y, jnp.float32)
    if loss_function == "l2":
        return diff**2
    if loss_function == "l1":
        return jnp.abs(diff)
    if loss_function in ("smooth_l1", "huber"):
        absd = jnp.abs(diff)
        return jnp.where(absd < 1.0, 0.5 * diff**2, absd - 0.5)
    raise ValueError(f"unknown loss_function {loss_function}")
