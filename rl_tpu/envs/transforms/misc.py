"""Env-control, dtype, key, and action transforms.

Reference originals: ``torchrl/envs/transforms/_env.py`` (StepCounter :693,
InitTracker :1499, TensorDictPrimer :211), ``_device.py`` (DoubleToFloat
:415, DTypeCastTransform :43), ``_keys.py`` (Exclude :42 / Select :130 /
Rename :250), ``_tensor.py`` (CatTensors :45), ``_action.py`` (ActionScaling
:1004, ActionMask :176).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Composite, TDict, TensorSpec, Unbounded, unravel_key
from .base import Transform

__all__ = [
    "StepCounter",
    "InitTracker",
    "TensorDictPrimer",
    "DoubleToFloat",
    "DTypeCastTransform",
    "ExcludeTransform",
    "SelectTransform",
    "RenameTransform",
    "CatTensors",
    "ActionScaling",
    "ActionMask",
    "UnaryTransform",
]


class StepCounter(Transform):
    """Track per-episode step counts; optionally truncate at ``max_steps``.

    Reference: _env.py:693.  Writes ``step_count`` (int32, shaped like
    ``done``); when ``max_steps`` is set, ORs ``truncated``/``done``.
    """
    row_stateful = True

    def __init__(self, max_steps: int | None = None, step_count_key: str = "step_count"):
        super().__init__()
        self.max_steps = max_steps
        self.key = step_count_key

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        count = jnp.zeros(done.shape, jnp.int32)
        return TDict(count=count), td.set(self.key, count)

    def step(self, tstate, next_td):
        count = tstate["count"] + 1
        next_td = next_td.set(self.key, count)
        if self.max_steps is not None:
            trunc = next_td["truncated"] | (count >= self.max_steps)
            next_td = next_td.set("truncated", trunc).set(
                "done", next_td["terminated"] | trunc
            )
        return TDict(count=count), next_td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.key] = Unbounded((1,), jnp.int32)
        return spec


class InitTracker(Transform):
    """Write ``is_init``: True on reset steps, False otherwise
    (reference _env.py:1499). Used to reset recurrent states mid-sequence."""
    row_stateful = True

    def __init__(self, init_key: str = "is_init"):
        super().__init__()
        self.key = init_key

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        return TDict(), td.set(self.key, jnp.ones(done.shape, jnp.bool_))

    def step(self, tstate, next_td):
        done = jnp.asarray(next_td["done"])
        return tstate, next_td.set(self.key, jnp.zeros(done.shape, jnp.bool_))

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.key] = Unbounded((1,), jnp.bool_)
        return spec


class TensorDictPrimer(Transform):
    """Inject default-valued extra keys at reset (e.g. recurrent states).

    Reference: _env.py:211.  ``primers`` maps keys to specs; values default
    to ``spec.zero()`` (or ``rand`` with ``random=True``).
    """
    row_stateful = True

    def __init__(self, primers: dict | Composite, random: bool = False):
        super().__init__()
        if not isinstance(primers, Composite):
            primers = Composite(primers)
        self.primers = primers
        self.random = random

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        batch = done.shape[:-1]
        vals = self.primers.rand(key, batch) if self.random else self.primers.zero(batch)
        return TDict(), td.update(vals)

    def step(self, tstate, next_td):
        # carried keys pass through: if absent in next (env didn't write
        # them), re-prime with zeros so step_mdp keeps the key present.
        done = jnp.asarray(next_td["done"])
        batch = done.shape[:-1]
        for k in self.primers.keys(include_nested=True, leaves_only=True):
            if k not in next_td:
                next_td = next_td.set(k, self.primers[k].zero(batch))
        return tstate, next_td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for k in self.primers.keys(include_nested=True, leaves_only=True):
            spec[k] = self.primers[k]
        return spec


class DTypeCastTransform(Transform):
    """Cast selected (or all floating) keys between dtypes (reference _device.py:43)."""

    def __init__(self, dtype_in, dtype_out, in_keys=None, out_keys=None):
        super().__init__(in_keys or [], out_keys)
        self.dtype_in = jnp.dtype(dtype_in)
        self.dtype_out = jnp.dtype(dtype_out)

    def _cast(self, td: TDict) -> TDict:
        if self.in_keys:
            for kin, kout in zip(self.in_keys, self.out_keys):
                if kin in td:
                    td = td.set(kout, jnp.asarray(td[kin]).astype(self.dtype_out))
            return td
        return td.apply(
            lambda x: x.astype(self.dtype_out) if jnp.asarray(x).dtype == self.dtype_in else x
        )

    def reset(self, key, tstate, td):
        return TDict(), self._cast(td)

    def step(self, tstate, next_td):
        return tstate, self._cast(next_td)

    def _spec_cast(self, spec: Composite) -> Composite:
        for k in list(spec.keys(include_nested=True, leaves_only=True)):
            leaf = spec[k]
            if getattr(leaf, "dtype", None) == self.dtype_in:
                spec[k] = Unbounded(leaf.shape, self.dtype_out)
        return spec

    def transform_observation_spec(self, spec):
        return self._spec_cast(spec)

    def transform_reward_spec(self, spec):
        return self._spec_cast(spec)


class DoubleToFloat(DTypeCastTransform):
    """float64 → float32 (reference _device.py:415). Mostly a no-op on TPU
    (x64 is disabled by default in JAX) but kept for config parity."""

    def __init__(self, in_keys=None, out_keys=None):
        super().__init__(jnp.float64, jnp.float32, in_keys, out_keys)


class ExcludeTransform(Transform):
    """Drop keys from step/reset outputs (reference _keys.py:42)."""

    def __init__(self, *keys):
        super().__init__()
        self.keys_to_exclude = keys

    def reset(self, key, tstate, td):
        return TDict(), td.exclude(*self.keys_to_exclude)

    def step(self, tstate, next_td):
        return tstate, next_td.exclude(*self.keys_to_exclude)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        return spec.exclude(*self.keys_to_exclude)


class SelectTransform(Transform):
    """Keep only selected keys (+ done/reward bookkeeping keys)
    (reference _keys.py:130)."""

    BOOKKEEPING = ("done", "terminated", "truncated", "reward")

    def __init__(self, *keys):
        super().__init__()
        self.keys_to_select = keys

    def _sel(self, td: TDict) -> TDict:
        keep = [k for k in self.keys_to_select if k in td]
        keep += [k for k in self.BOOKKEEPING if k in td]
        return td.select(*keep)

    def reset(self, key, tstate, td):
        return TDict(), self._sel(td)

    def step(self, tstate, next_td):
        return tstate, self._sel(next_td)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        keep = [k for k in self.keys_to_select if k in spec]
        return spec.select(*keep) if keep else spec


class RenameTransform(Transform):
    """Rename keys (reference _keys.py:250)."""

    def __init__(self, in_keys: Sequence, out_keys: Sequence):
        super().__init__(in_keys, out_keys)

    def _ren(self, td: TDict) -> TDict:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in td:
                td = td.rename_key(kin, kout)
        return td

    def reset(self, key, tstate, td):
        return TDict(), self._ren(td)

    def step(self, tstate, next_td):
        return tstate, self._ren(next_td)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in spec:
                spec[kout] = spec[kin]
                del spec[kin]
        return spec


class CatTensors(Transform):
    """Concatenate several keys into one along the last dim
    (reference _tensor.py:45)."""

    def __init__(self, in_keys: Sequence, out_key="observation_vector", del_keys: bool = True):
        super().__init__(in_keys, [out_key])
        self.out_key = out_key
        self.del_keys = del_keys

    def _cat(self, td: TDict) -> TDict:
        vals = [jnp.atleast_1d(jnp.asarray(td[k], jnp.float32)) for k in self.in_keys]
        td = td.set(self.out_key, jnp.concatenate(vals, axis=-1))
        if self.del_keys:
            td = td.exclude(*self.in_keys)
        return td

    def reset(self, key, tstate, td):
        return TDict(), self._cat(td)

    def step(self, tstate, next_td):
        return tstate, self._cat(next_td)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        total = 0
        for k in self.in_keys:
            leaf = spec[k]
            total += leaf.shape[-1] if leaf.shape else 1
        spec[self.out_key] = Unbounded(
            (spec[self.in_keys[0]].shape[:-1] or ()) [:0] + (total,), jnp.float32
        )
        if self.del_keys:
            for k in self.in_keys:
                del spec[k]
        return spec


class ActionScaling(Transform):
    """Policy-space ``[-1, 1]`` action → env-space ``[low, high]`` on the way
    in (reference _action.py:1004)."""

    def __init__(self, low, high, in_keys_inv=("action",), out_keys_inv=None):
        super().__init__(in_keys_inv=in_keys_inv, out_keys_inv=out_keys_inv)
        self.low = np.asarray(low, np.float32)
        self.high = np.asarray(high, np.float32)

    def _apply_value_inv(self, value):
        low, high = jnp.asarray(self.low), jnp.asarray(self.high)
        return low + (jnp.clip(value, -1.0, 1.0) + 1.0) * 0.5 * (high - low)

    def transform_action_spec(self, spec: Composite) -> Composite:
        for kin in self.in_keys_inv:
            leaf = spec[kin]
            spec[kin] = Bounded(-1.0, 1.0, leaf.shape, leaf.dtype)
        return spec


class ActionMask(Transform):
    """Project actions onto a mask key provided by the env
    (reference _action.py:176): invalid sampled actions are remapped to the
    first valid one."""

    def __init__(self, action_key="action", mask_key="action_mask"):
        super().__init__(in_keys_inv=(action_key,))
        self.action_key = action_key
        self.mask_key = mask_key

    def inv(self, tstate, td):
        if self.mask_key not in td:
            return td
        mask = jnp.asarray(td[self.mask_key])
        action = jnp.asarray(td[self.action_key])
        valid = jnp.take_along_axis(
            mask, action[..., None].astype(jnp.int32), axis=-1
        ).squeeze(-1)
        first_valid = jnp.argmax(mask, axis=-1).astype(action.dtype)
        return td.set(self.action_key, jnp.where(valid, action, first_valid))


class UnaryTransform(Transform):
    """Apply an arbitrary elementwise fn to keys (reference _tensor.py:230)."""

    def __init__(self, fn, in_keys, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.fn = fn

    def _apply_value(self, value):
        return self.fn(value)
