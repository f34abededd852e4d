"""Smaller module-layer components: gSDE and ConsistentDropout.

Counterparts of ``/root/reference/torchrl/modules/models/exploration.py``:
``gSDEModule`` :280 (generalized state-dependent exploration — noise is a
learned linear function of the state, resampled per-episode) and
``ConsistentDropout`` :571 (a dropout mask held fixed across a rollout for
consistent exploration/uncertainty).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict

__all__ = ["gSDEModule", "ConsistentDropout"]


class gSDEModule:
    """State-dependent exploration noise (Raffin et al. 2021).

    ``action = loc + (state @ E) σ`` where ``E`` is a noise matrix resampled
    only when ``is_init`` fires (per-episode), giving smooth in-episode
    exploration.  The noise matrix lives in explicit state (like the OU
    module): ``state = init_state(key, batch)``; call returns updated state.
    """

    def __init__(self, state_dim: int, action_dim: int, *,
                 sigma_init: float = 0.5,
                 state_key: str = "observation", loc_key: str = "loc",
                 action_key: str = "action", is_init_key: str = "is_init"):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.sigma_init = sigma_init
        self.state_key = state_key
        self.loc_key = loc_key
        self.action_key = action_key
        self.is_init_key = is_init_key

    def init_state(self, key, batch_shape=()) -> TDict:
        eps = jax.random.normal(
            key, tuple(batch_shape) + (self.state_dim, self.action_dim)
        )
        return TDict(eps=eps)

    def __call__(self, gstate: TDict, td: TDict, key) -> tuple[TDict, TDict]:
        eps = gstate["eps"]
        if self.is_init_key in td:
            is_init = jnp.asarray(td[self.is_init_key])
            if is_init.shape and is_init.shape[-1] == 1:
                is_init = is_init.squeeze(-1)
            fresh = jax.random.normal(key, eps.shape)
            mask = is_init.reshape(is_init.shape + (1,) * (eps.ndim - is_init.ndim))
            eps = jnp.where(mask, fresh, eps)
        obs = jnp.asarray(td[self.state_key])
        noise = jnp.einsum("...d,...da->...a", obs, eps) * self.sigma_init
        loc = td.get(self.loc_key, None)
        if loc is None:
            loc = td[self.action_key]
        loc = jnp.asarray(loc)
        return gstate.set("eps", eps), td.set(self.action_key, loc + noise)


class ConsistentDropout:
    """Dropout with an explicit, carried mask (reference :571).

    ``mask_state = make_mask(key, shape)`` once per rollout (or on
    ``is_init``); ``apply(x, mask)`` uses the same mask every step —
    consistent MC-dropout uncertainty across a trajectory.
    """

    def __init__(self, p: float = 0.1):
        self.p = float(p)

    def make_mask(self, key, shape) -> jax.Array:
        keep = jax.random.bernoulli(key, 1.0 - self.p, shape)
        return keep.astype(jnp.float32) / (1.0 - self.p)

    def refresh_where(self, mask, is_init, key) -> jax.Array:
        fresh = self.make_mask(key, mask.shape)
        m = jnp.asarray(is_init)
        if m.shape and m.shape[-1] == 1:
            m = m.squeeze(-1)
        sel = m.reshape(m.shape + (1,) * (mask.ndim - m.ndim))
        return jnp.where(sel, fresh, mask)

    def __call__(self, x, mask) -> jax.Array:
        return x * mask
