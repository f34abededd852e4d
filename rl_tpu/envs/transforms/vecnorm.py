"""VecNorm — running observation/reward normalization.

Counterpart of the reference ``VecNorm``/``VecNormV2``
(``/root/reference/torchrl/envs/transforms/_normalization.py:466``,
``vecnorm.py:34``): exponential-moving-average mean/var statistics updated
every step, shared across the env batch.  The reference shares stats across
worker processes via shared-memory TensorDicts; here the stats are part of
the carried transform state of the *batched* env, so sharing across the
batch is automatic and cross-host sharing is a ``psum`` (see
``rl_tpu.parallel``) — no locks.

``on_done`` keeps the stepped stats: running statistics survive episode
boundaries (reference semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict, Unbounded
from .base import Transform

__all__ = ["VecNorm"]


class VecNorm(Transform):
    def __init__(
        self,
        in_keys=("observation",),
        out_keys=None,
        decay: float = 0.9999,
        eps: float = 1e-4,
        batch_ndim: int = 0,
        frozen: bool = False,
    ):
        super().__init__(in_keys, out_keys)
        self.decay = float(decay)
        self.eps = float(eps)
        self.batch_ndim = int(batch_ndim)
        self.frozen = frozen

    # -- stats --------------------------------------------------------------
    def _init_stats(self, value) -> TDict:
        shape = jnp.asarray(value).shape[self.batch_ndim:]
        return TDict(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.zeros((), jnp.float32),
        )

    def _update(self, stats: TDict, value) -> TDict:
        if self.frozen:
            return stats
        v = jnp.asarray(value, jnp.float32)
        axes = tuple(range(self.batch_ndim))
        batch_mean = jnp.mean(v, axis=axes) if axes else v
        batch_sq = jnp.mean(v * v, axis=axes) if axes else v * v
        count = stats["count"] + 1.0
        # bias-corrected EMA: behaves like a plain average early on
        w = jnp.minimum(1.0 - self.decay, 1.0 / count)
        mean = stats["mean"] * (1 - w) + batch_mean * w
        sq = (stats["var"] + stats["mean"] ** 2) * (1 - w) + batch_sq * w
        var = jnp.maximum(sq - mean**2, 0.0)
        return TDict(mean=mean, var=var, count=count)

    def _normalize(self, stats: TDict, value):
        v = jnp.asarray(value, jnp.float32)
        return (v - stats["mean"]) / jnp.sqrt(stats["var"] + self.eps)

    # -- transform hooks -----------------------------------------------------
    def reset(self, key, tstate, td):
        state = TDict()
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin not in td:
                continue
            stats = (
                tstate[kout]
                if tstate is not None and kout in tstate
                else self._init_stats(td[kin])
            )
            state = state.set(kout, stats)
            td = td.set(kout, self._normalize(stats, td[kin]))
        return state, td

    def step(self, tstate, next_td):
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin not in next_td:
                continue
            stats = self._update(tstate[kout], next_td[kin])
            tstate = tstate.set(kout, stats)
            next_td = next_td.set(kout, self._normalize(stats, next_td[kin]))
        return tstate, next_td

    def on_done(self, tstate_reset, tstate_stepped, done):
        return tstate_stepped  # stats persist across episode boundaries

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in spec:
                leaf = spec[kin]
                spec[kout] = Unbounded(leaf.shape, jnp.float32)
        return spec

    def transform_reward_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in spec:
                leaf = spec[kin]
                spec[kout] = Unbounded(leaf.shape, jnp.float32)
        return spec


class VecNormV2(VecNorm):
    """Reference ``VecNormV2`` (vecnorm.py:34) API surface over the same
    running statistics.  ``stateful=False`` freezes updates and requires
    stats to be provided via ``loc``/``scale`` at construction (the
    stateless mode the reference uses for eval workers)."""

    def __init__(self, in_keys=("observation",), out_keys=None, *,
                 stateful: bool = True, decay: float = 0.9999,
                 eps: float = 1e-4, loc=None, scale=None, **kw):
        super().__init__(in_keys, out_keys, decay=decay, eps=eps,
                         frozen=not stateful, **kw)
        self.stateful = stateful
        self._loc = loc
        self._scale = scale

    def freeze(self):
        self.frozen = True
        return self

    def unfreeze(self):
        self.frozen = False
        return self

    def _init_stats(self, value):
        if self._loc is not None:
            return TDict(
                mean=jnp.asarray(self._loc, jnp.float32),
                var=jnp.asarray(self._scale, jnp.float32) ** 2,
                count=jnp.ones((), jnp.float32),
            )
        return super()._init_stats(value)


class RunningMeanStd(VecNormV2):
    """Alias with the gym-style name (reference vecnorm.py helper)."""
