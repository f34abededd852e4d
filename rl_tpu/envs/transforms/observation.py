"""Observation transforms.

Counterparts of the reference observation transform zoo
(``/root/reference/torchrl/envs/transforms/_observation.py`` and
``_normalization.py``); each class cites its reference original.  All are
pure functions over pytrees; stateful ones (CatFrames) carry explicit state.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Composite, TDict, Unbounded
from .base import Transform

__all__ = [
    "ObservationNorm",
    "CatFrames",
    "GrayScale",
    "Resize",
    "CenterCrop",
    "Crop",
    "ToTensorImage",
    "FlattenObservation",
    "UnsqueezeTransform",
    "SqueezeTransform",
    "PermuteTransform",
    "ClipTransform",
]

DEFAULT_IN = ("observation",)


class ObservationNorm(Transform):
    """Affine observation normalization (reference _normalization.py:52).

    ``standard_normal=True``: ``(obs - loc) / scale``; else ``obs*scale+loc``.
    """

    def __init__(self, loc=0.0, scale=1.0, in_keys=DEFAULT_IN, out_keys=None,
                 standard_normal: bool = True, eps: float = 1e-6):
        super().__init__(in_keys, out_keys)
        self.loc = np.asarray(loc, np.float32)
        self.scale = np.asarray(scale, np.float32)
        self.standard_normal = standard_normal
        self.eps = eps

    def _apply_value(self, value):
        loc, scale = jnp.asarray(self.loc), jnp.asarray(self.scale)
        if self.standard_normal:
            return (value - loc) / jnp.maximum(scale, self.eps)
        return value * scale + loc

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in spec:
                leaf = spec[kin]
                spec[kout] = Unbounded(leaf.shape, leaf.dtype)
        return spec

    @staticmethod
    def stats_from_batch(batch, axis=(0,)):
        """Compute (loc, scale) from example data (reference init_stats)."""
        loc = jnp.mean(batch, axis=axis)
        scale = jnp.std(batch, axis=axis)
        return loc, scale


class CatFrames(Transform):
    """Frame stacking with reset-aware padding (reference _observation.py:867).

    State per key: ``[N, *obs]`` buffer; output concatenates the N frames
    along ``axis`` (e.g. channel axis ``-1`` for NHWC pixels).  On reset the
    buffer is filled with the first observation (the reference's default
    ``padding="same"``).
    """
    row_stateful = True

    def __init__(self, N: int, axis: int = -1, in_keys=DEFAULT_IN, out_keys=None,
                 padding: str = "same"):
        super().__init__(in_keys, out_keys)
        self.N = int(N)
        self.axis = axis
        if padding not in ("same", "zeros"):
            raise ValueError(f"padding must be 'same' or 'zeros', got {padding}")
        self.padding = padding

    def _out(self, buf):
        # [N, *obs] -> concat along self.axis of obs
        frames = [buf[i] for i in range(self.N)]
        return jnp.concatenate(frames, axis=self.axis)

    def reset(self, key, tstate, td):
        state = TDict()
        for kin, kout in zip(self.in_keys, self.out_keys):
            obs = jnp.asarray(td[kin])
            if self.padding == "same":
                buf = jnp.broadcast_to(obs[None], (self.N,) + obs.shape)
            else:
                buf = jnp.zeros((self.N,) + obs.shape, obs.dtype)
                buf = buf.at[-1].set(obs)
            state = state.set(kout, buf)
            td = td.set(kout, self._out(buf))
        return state, td

    def step(self, tstate, next_td):
        for kin, kout in zip(self.in_keys, self.out_keys):
            obs = jnp.asarray(next_td[kin])
            buf = jnp.roll(tstate[kout], -1, axis=0).at[-1].set(obs)
            tstate = tstate.set(kout, buf)
            next_td = next_td.set(kout, self._out(buf))
        return tstate, next_td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            shape = list(leaf.shape)
            shape[self.axis] = shape[self.axis] * self.N
            spec[kout] = Unbounded(tuple(shape), leaf.dtype)
        return spec


class GrayScale(Transform):
    """RGB→luma on the trailing channel axis (reference _observation.py:828)."""

    WEIGHTS = np.array([0.2989, 0.587, 0.114], np.float32)

    def __init__(self, in_keys=("pixels",), out_keys=None):
        super().__init__(in_keys, out_keys)

    def _apply_value(self, value):
        w = jnp.asarray(self.WEIGHTS, value.dtype if jnp.issubdtype(value.dtype, jnp.floating) else jnp.float32)
        v = value.astype(w.dtype)
        return jnp.sum(v * w, axis=-1, keepdims=True).astype(value.dtype if jnp.issubdtype(value.dtype, jnp.floating) else jnp.float32)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            spec[kout] = Unbounded(leaf.shape[:-1] + (1,), jnp.float32 if not jnp.issubdtype(leaf.dtype, jnp.floating) else leaf.dtype)
        return spec


class Resize(Transform):
    """Bilinear resize of the H, W dims of HWC images (reference _observation.py:166)."""

    def __init__(self, h: int, w: int | None = None, in_keys=("pixels",), out_keys=None,
                 method: str = "bilinear"):
        super().__init__(in_keys, out_keys)
        self.h = int(h)
        self.w = int(w if w is not None else h)
        self.method = method

    def _apply_value(self, value):
        shape = value.shape[:-3] + (self.h, self.w, value.shape[-1])
        dtype = value.dtype
        out = jax.image.resize(value.astype(jnp.float32), shape, self.method)
        return out if jnp.issubdtype(dtype, jnp.floating) else out.astype(dtype)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            spec[kout] = Unbounded(leaf.shape[:-3] + (self.h, self.w, leaf.shape[-1]), leaf.dtype)
        return spec


class CenterCrop(Transform):
    """Center crop H, W of HWC images (reference _observation.py:341)."""

    def __init__(self, h: int, w: int | None = None, in_keys=("pixels",), out_keys=None):
        super().__init__(in_keys, out_keys)
        self.h = int(h)
        self.w = int(w if w is not None else h)

    def _apply_value(self, value):
        H, W = value.shape[-3], value.shape[-2]
        top, left = (H - self.h) // 2, (W - self.w) // 2
        return value[..., top:top + self.h, left:left + self.w, :]

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            spec[kout] = Unbounded(leaf.shape[:-3] + (self.h, self.w, leaf.shape[-1]), leaf.dtype)
        return spec


class Crop(Transform):
    """Crop at a fixed top/left position (reference _observation.py:274)."""

    def __init__(self, h: int, w: int, top: int = 0, left: int = 0,
                 in_keys=("pixels",), out_keys=None):
        super().__init__(in_keys, out_keys)
        self.h, self.w, self.top, self.left = int(h), int(w), int(top), int(left)

    def _apply_value(self, value):
        return value[..., self.top:self.top + self.h, self.left:self.left + self.w, :]

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            spec[kout] = Unbounded(leaf.shape[:-3] + (self.h, self.w, leaf.shape[-1]), leaf.dtype)
        return spec


class ToTensorImage(Transform):
    """uint8 [0,255] HWC → float32 [0,1] (reference _observation.py:56).

    The reference moves channels first (CHW, torch conv layout); TPU convs
    are NHWC-native so we keep HWC by default (``channel_first=True`` opts
    into the reference layout).
    """

    def __init__(self, in_keys=("pixels",), out_keys=None, channel_first: bool = False):
        super().__init__(in_keys, out_keys)
        self.channel_first = channel_first

    def _apply_value(self, value):
        out = value.astype(jnp.float32) / 255.0
        if self.channel_first:
            out = jnp.moveaxis(out, -1, -3)
        return out

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            shape = leaf.shape
            if self.channel_first:
                shape = shape[:-3] + (shape[-1], shape[-3], shape[-2])
            spec[kout] = Bounded(0.0, 1.0, shape, jnp.float32)
        return spec


class FlattenObservation(Transform):
    """Flatten dims [first_dim, last_dim] (reference _observation.py:402)."""

    def __init__(self, first_dim: int, last_dim: int = -1, in_keys=DEFAULT_IN, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.first_dim = first_dim
        self.last_dim = last_dim

    def _apply_value(self, value):
        f = self.first_dim % value.ndim
        l = self.last_dim % value.ndim
        new_shape = value.shape[:f] + (-1,) + value.shape[l + 1:]
        return value.reshape(new_shape)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            f = self.first_dim % len(leaf.shape)
            l = self.last_dim % len(leaf.shape)
            flat = int(np.prod(leaf.shape[f:l + 1]))
            spec[kout] = Unbounded(leaf.shape[:f] + (flat,) + leaf.shape[l + 1:], leaf.dtype)
        return spec


class UnsqueezeTransform(Transform):
    """Insert a size-1 dim (reference _observation.py:489)."""

    def __init__(self, dim: int, in_keys=DEFAULT_IN, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.dim = dim

    def _apply_value(self, value):
        return jnp.expand_dims(value, self.dim)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            d = self.dim % (len(leaf.shape) + 1)
            spec[kout] = Unbounded(leaf.shape[:d] + (1,) + leaf.shape[d:], leaf.dtype)
        return spec


class SqueezeTransform(Transform):
    """Remove a size-1 dim (reference _observation.py:617)."""

    def __init__(self, dim: int, in_keys=DEFAULT_IN, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.dim = dim

    def _apply_value(self, value):
        return jnp.squeeze(value, self.dim)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            d = self.dim % len(leaf.shape)
            spec[kout] = Unbounded(leaf.shape[:d] + leaf.shape[d + 1:], leaf.dtype)
        return spec


class PermuteTransform(Transform):
    """Permute dims (reference _observation.py:665)."""

    def __init__(self, dims: Sequence[int], in_keys=DEFAULT_IN, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.dims = tuple(dims)

    def _apply_value(self, value):
        return jnp.transpose(value, self.dims)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            spec[kout] = Unbounded(tuple(leaf.shape[d] for d in self.dims), leaf.dtype)
        return spec


class ClipTransform(Transform):
    """Clip values of selected keys (reference _clip.py:37)."""

    def __init__(self, low=None, high=None, in_keys=DEFAULT_IN, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.low = low
        self.high = high

    def _apply_value(self, value):
        return jnp.clip(value, self.low, self.high)
