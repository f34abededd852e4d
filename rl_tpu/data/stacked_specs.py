"""Stacked (ragged/heterogeneous) specs — pad + mask under static shapes.

Counterparts of the reference lazy-stacked specs
(``/root/reference/torchrl/data/tensor_specs.py``: ``Stacked`` :1496,
``StackedComposite`` :6463), used for heterogeneous multi-agent groups
(agents with different observation/action shapes).

The reference stacks lazily and keeps ragged shapes; XLA needs static
shapes, so the TPU design commits to the padding at the spec level
(SURVEY §2.3 note): every element is padded to the per-key maximum shape
and the spec exposes boolean validity masks.  Data produced by
``rand``/``zero`` is always padded; consumers mask with ``spec.mask()``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .specs import Composite, TensorSpec, Unbounded
from .tdict import TDict, unravel_key

__all__ = ["Stacked", "StackedComposite"]


def _pad_to(arr: jax.Array, shape: tuple[int, ...]):
    pads = [(0, t - s) for s, t in zip(arr.shape, shape)]
    return jnp.pad(arr, pads)


class Stacked(TensorSpec):
    """Stack of N heterogeneous leaf specs along a new leading dim.

    ``shape`` is ``(N, *max_shape)``; ``mask()`` gives [N, *max_shape] bool.
    """

    def __init__(self, *specs: TensorSpec, dim: int = 0):
        if dim != 0:
            raise NotImplementedError("Stacked supports dim=0 (leading)")
        if not specs:
            raise ValueError("need at least one spec")
        self.specs = list(specs)
        ndim = max(len(s.shape) for s in specs)
        padded = [(1,) * (ndim - len(s.shape)) + s.shape for s in specs]
        self.elem_shape = tuple(max(dims) for dims in zip(*padded)) if ndim else ()
        self.shape = (len(specs),) + self.elem_shape
        self.dtype = specs[0].dtype

    def _elem_padded_shape(self, s: TensorSpec) -> tuple[int, ...]:
        """Element shapes left-pad with 1s to the common ndim."""
        return (1,) * (len(self.elem_shape) - len(s.shape)) + s.shape

    def mask(self) -> jax.Array:
        m = np.zeros(self.shape, bool)
        for i, s in enumerate(self.specs):
            region = tuple(slice(0, d) for d in self._elem_padded_shape(s))
            m[(i, *region)] = True
        return jnp.asarray(m)

    def rand(self, key, shape=()):
        batch = tuple(shape)
        keys = jax.random.split(key, len(self.specs))
        parts = []
        for s, k in zip(self.specs, keys):
            v = jnp.asarray(s.rand(k, batch), self.dtype)
            pshape = self._elem_padded_shape(s)
            v = v.reshape(batch + pshape)
            pads = [(0, 0)] * len(batch) + [
                (0, t - d) for d, t in zip(pshape, self.elem_shape)
            ]
            if pads:
                v = jnp.pad(v, pads)
            parts.append(v)
        return jnp.stack(parts, axis=len(batch))

    def zero(self, shape=()):
        return jnp.zeros(tuple(shape) + self.shape, self.dtype)

    def is_in(self, val) -> bool:
        val = np.asarray(val)
        if val.shape[-len(self.shape):] != self.shape:
            return False
        lead = val.ndim - len(self.shape)
        for i, s in enumerate(self.specs):
            pshape = self._elem_padded_shape(s)
            region = (Ellipsis, i) + tuple(slice(0, d) for d in pshape)
            sub = val[region].reshape(val.shape[:lead] + s.shape)
            if not s.is_in(sub):
                return False
        return True

    def project(self, val):
        return val  # padded regions are unconstrained

    def expand(self, *batch_shape):
        raise NotImplementedError("expand a Stacked spec per-element instead")

    def __repr__(self):
        return f"Stacked({len(self.specs)} specs, shape={self.shape})"


class StackedComposite:
    """Stack of N heterogeneous Composites (reference :6463).

    Exposes the union of keys; each key becomes a :class:`Stacked` leaf over
    the per-element specs (missing keys padded with zero-shaped Unbounded).
    ``rand``/``zero`` return TDicts with an extra ``("masks", key)`` entry
    per ragged key.
    """

    def __init__(self, *composites: Composite):
        self.composites = list(composites)
        self.n = len(composites)
        keys: dict[tuple, list] = {}
        for i, c in enumerate(composites):
            for k in c.keys(include_nested=True, leaves_only=True):
                keys.setdefault(unravel_key(k), []).append((i, c[k]))
        self._stacked: dict[tuple, Stacked] = {}
        for k, entries in keys.items():
            per_elem = []
            for i in range(self.n):
                match = [s for j, s in entries if j == i]
                per_elem.append(match[0] if match else Unbounded((), entries[0][1].dtype))
            self._stacked[k] = Stacked(*per_elem)

    def keys(self):
        return list(self._stacked.keys())

    def __getitem__(self, key):
        return self._stacked[unravel_key(key)]

    def rand(self, key, shape=()) -> TDict:
        out = TDict()
        ks = jax.random.split(key, max(len(self._stacked), 1))
        for (k, spec), kk in zip(self._stacked.items(), ks):
            out = out.set(k, spec.rand(kk, shape))
            out = out.set(("masks",) + k, spec.mask())
        return out

    def zero(self, shape=()) -> TDict:
        out = TDict()
        for k, spec in self._stacked.items():
            out = out.set(k, spec.zero(shape))
            out = out.set(("masks",) + k, spec.mask())
        return out

    def is_in(self, td: TDict) -> bool:
        return all(
            spec.is_in(td[k]) for k, spec in self._stacked.items() if k in td
        )
