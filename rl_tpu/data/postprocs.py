"""Collector post-processors.

Counterpart of ``/root/reference/torchrl/data/postprocs/postprocs.py``:
``MultiStep`` :85 (n-step returns at collector output), ``DensifyReward``
:299.

Operates on time-first ``[T, B?, ...]`` collector batches; fully jittable
(vectorized gathers; no python data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data.tdict import TDict

__all__ = ["MultiStep", "DensifyReward"]


class MultiStep:
    """Rewrite transitions to n-step: ``reward ← Σ_{k<n} γ^k r_{t+k}`` (the
    sum truncating at episode ends), ``next`` ← the state n steps ahead (or
    the episode's last), plus ``steps_to_next_obs`` for the estimator's
    γ-exponent.  Reference: postprocs.py:85.
    """

    def __init__(self, gamma: float, n_steps: int):
        self.gamma = float(gamma)
        self.n_steps = int(n_steps)

    def __call__(self, batch: TDict) -> TDict:
        T = jnp.asarray(batch["next", "reward"]).shape[0]
        reward = jnp.asarray(batch["next", "reward"], jnp.float32)  # [T, ..., 1]
        done = jnp.asarray(batch["next", "done"])  # [T, ..., 1]
        r = reward.squeeze(-1)
        d = done.squeeze(-1).astype(jnp.float32)

        def shift(x, k, fill=0.0):
            """x[t+k] with tail padding."""
            pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x[k:], pad], axis=0)

        acc = r
        # index (along time) of the transition supplying the ``next`` state
        t_idx = jnp.broadcast_to(
            jnp.arange(T).reshape((T,) + (1,) * (r.ndim - 1)), r.shape
        )
        idx_next = t_idx
        steps = jnp.ones_like(r)
        alive = 1.0 - d  # no done in [t, t+k-1]
        for k in range(1, self.n_steps):
            valid = alive * (t_idx + k < T)
            acc = acc + (self.gamma**k) * shift(r, k) * valid
            idx_next = jnp.where(valid > 0, jnp.minimum(t_idx + k, T - 1), idx_next)
            steps = jnp.where(valid > 0, float(k + 1), steps)
            alive = alive * (1.0 - shift(d, k))

        gather_idx = idx_next.astype(jnp.int32)

        def gather_time(x):
            x = jnp.asarray(x)
            gi = gather_idx.reshape(gather_idx.shape + (1,) * (x.ndim - gather_idx.ndim))
            gi = jnp.broadcast_to(gi, gather_idx.shape + x.shape[gather_idx.ndim:])
            return jnp.take_along_axis(x, gi, axis=0)

        new_next = jax.tree.map(gather_time, batch["next"])
        new_next = new_next.set("reward", acc[..., None]).set(
            "steps_to_next_obs", steps[..., None].astype(jnp.int32)
        )
        # original-step flags describe the *transition start*; keep them at
        # root untouched, next flags come from the gathered end step.
        return batch.set("next", new_next)


class DensifyReward:
    """Spread an episode's terminal reward uniformly (or discounted) over its
    steps (reference postprocs.py:299)."""

    def __init__(self, discount: float = 1.0):
        self.discount = float(discount)

    def __call__(self, batch: TDict) -> TDict:
        reward = jnp.asarray(batch["next", "reward"], jnp.float32).squeeze(-1)
        done = jnp.asarray(batch["next", "done"]).squeeze(-1)

        # backward within-episode discounted return, then broadcast it to
        # every step of the episode
        def body(carry, rd):
            r, d = rd
            g = r + self.discount * carry * (1.0 - d.astype(jnp.float32))
            return g, g

        _, returns = jax.lax.scan(
            body, jnp.zeros_like(reward[0]), (reward, done), reverse=True
        )
        return batch.set("next", batch["next"].set("reward", returns[..., None]))
