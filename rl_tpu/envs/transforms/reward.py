"""Reward transforms (reference ``torchrl/envs/transforms/_reward.py`` and
``_normalization.py:366``)."""
from __future__ import annotations

import jax.numpy as jnp

from rl_tpu.data import Bounded, Composite, TDict, Unbounded
from .base import Transform

__all__ = [
    "RewardScaling",
    "RewardClipping",
    "BinarizeReward",
    "SignTransform",
    "RewardSum",
]

REWARD_IN = ("reward",)


class RewardScaling(Transform):
    """``reward = reward * scale + loc`` (reference _normalization.py:366)."""

    def __init__(self, loc=0.0, scale=1.0, in_keys=REWARD_IN, out_keys=None,
                 standard_normal: bool = False):
        super().__init__(in_keys, out_keys)
        self.loc = float(loc)
        self.scale = float(scale)
        self.standard_normal = standard_normal

    def _apply_value(self, value):
        if self.standard_normal:
            return (value - self.loc) / self.scale
        return value * self.scale + self.loc

    def transform_reward_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in spec:
                leaf = spec[kin]
                spec[kout] = Unbounded(leaf.shape, leaf.dtype)
        return spec


class RewardClipping(Transform):
    """Clip rewards (reference _reward.py:271)."""

    def __init__(self, clamp_min=None, clamp_max=None, in_keys=REWARD_IN, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.clamp_min = clamp_min
        self.clamp_max = clamp_max

    def _apply_value(self, value):
        return jnp.clip(value, self.clamp_min, self.clamp_max)

    def transform_reward_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in spec:
                leaf = spec[kin]
                lo = self.clamp_min if self.clamp_min is not None else -jnp.inf
                hi = self.clamp_max if self.clamp_max is not None else jnp.inf
                spec[kout] = Bounded(lo, hi, leaf.shape, leaf.dtype)
        return spec


class BinarizeReward(Transform):
    """``reward > 0`` → 1 else 0 (reference _reward.py:335)."""

    def __init__(self, in_keys=REWARD_IN, out_keys=None):
        super().__init__(in_keys, out_keys)

    def _apply_value(self, value):
        return (value > 0).astype(value.dtype)


class SignTransform(Transform):
    """``sign(reward)`` (reference _reward.py:805)."""

    def __init__(self, in_keys=REWARD_IN, out_keys=None):
        super().__init__(in_keys, out_keys)

    def _apply_value(self, value):
        return jnp.sign(value)


class RewardSum(Transform):
    """Accumulate per-episode return into ``episode_reward``
    (reference _reward.py:373).

    The value written at the done step is the final episode return; the
    accumulator resets via the auto-reset ``on_done`` select.
    """
    row_stateful = True

    def __init__(self, in_keys=REWARD_IN, out_keys=("episode_reward",)):
        super().__init__(in_keys, out_keys)

    def reset(self, key, tstate, td):
        state = TDict()
        for kin, kout in zip(self.in_keys, self.out_keys):
            # shape/dtype of the accumulator mirror the reward; at reset the
            # reward key is absent, so seed from done flags' batch shape.
            done = jnp.asarray(td["done"])
            acc = jnp.zeros(done.shape, jnp.float32)
            state = state.set(kout, acc)
            td = td.set(kout, acc)
        return state, td

    def step(self, tstate, next_td):
        for kin, kout in zip(self.in_keys, self.out_keys):
            acc = tstate[kout] + jnp.asarray(next_td[kin], jnp.float32)
            tstate = tstate.set(kout, acc)
            next_td = next_td.set(kout, acc)
        return tstate, next_td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kout in self.out_keys:
            spec[kout] = Unbounded((1,), jnp.float32)
        return spec
