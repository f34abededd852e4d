"""Gym/dm_control space → TensorSpec conversion.

Counterpart of the reference converters (``/root/reference/torchrl/envs/
gym_like.py`` + ``libs/gym.py`` ``_gym_to_torchrl_spec_transform``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rl_tpu.data import (
    Binary,
    Bounded,
    Categorical,
    Composite,
    MultiCategorical,
    TensorSpec,
    Unbounded,
)

__all__ = ["gym_space_to_spec", "dm_spec_to_spec"]


def gym_space_to_spec(space) -> TensorSpec | Composite:
    import gymnasium.spaces as S

    if isinstance(space, S.Box):
        if np.isinf(space.low).all() and np.isinf(space.high).all():
            return Unbounded(space.shape, jnp.dtype(space.dtype))
        return Bounded(space.low, space.high, space.shape, jnp.dtype(space.dtype))
    if isinstance(space, S.Discrete):
        return Categorical(int(space.n), (), jnp.int32)
    if isinstance(space, S.MultiDiscrete):
        return MultiCategorical(space.nvec.astype(np.int32))
    if isinstance(space, S.MultiBinary):
        return Binary(int(space.n))
    if isinstance(space, S.Dict):
        return Composite({k: gym_space_to_spec(v) for k, v in space.spaces.items()})
    if isinstance(space, S.Tuple):
        return Composite({str(i): gym_space_to_spec(s) for i, s in enumerate(space.spaces)})
    raise NotImplementedError(f"space {type(space)} not supported")


def dm_spec_to_spec(spec) -> TensorSpec:
    from dm_env import specs as dm_specs

    def _dt(dtype):
        # dm_control uses float64; JAX runs x32 by default
        d = jnp.dtype(dtype)
        return jnp.float32 if d == np.dtype("float64") else d

    if isinstance(spec, dm_specs.BoundedArray):
        return Bounded(spec.minimum, spec.maximum, spec.shape, _dt(spec.dtype))
    if isinstance(spec, dm_specs.Array):
        return Unbounded(spec.shape, _dt(spec.dtype))
    raise NotImplementedError(f"dm spec {type(spec)} not supported")
