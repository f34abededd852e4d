"""Tensor specs — shape/dtype/domain metadata for env & module contracts.

TPU-native re-design of the reference spec system
(``/root/reference/torchrl/data/tensor_specs.py``, classes cited per-class
below).  Specs are *static host-side objects* (bounds kept as numpy arrays):
inside ``jit`` they close over as constants; they never need to be traced.

Public surface mirrors the reference: ``rand / zero / one / is_in / project /
encode / expand / to / clone``, plus ``Composite`` as the env contract type
(reference tensor_specs.py:5042).
"""
from __future__ import annotations

import math
from typing import Any, Iterable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .tdict import TDict, NestedKey, unravel_key

__all__ = [
    "TensorSpec",
    "Bounded",
    "Unbounded",
    "UnboundedContinuous",
    "UnboundedDiscrete",
    "Categorical",
    "MultiCategorical",
    "OneHot",
    "MultiOneHot",
    "Binary",
    "NonTensor",
    "Choice",
    "Composite",
    "make_composite_from_td",
    "consolidate_spec",
]

Shape = tuple[int, ...]


def _shape(s) -> Shape:
    if s is None:
        return ()
    if isinstance(s, int):
        return (s,)
    return tuple(int(x) for x in s)


class TensorSpec:
    """Abstract spec. Reference: tensor_specs.py:607 (``TensorSpec`` ABC)."""

    shape: Shape
    dtype: Any

    def __init__(self, shape=(), dtype=jnp.float32):
        self.shape = _shape(shape)
        self.dtype = jnp.dtype(dtype)

    # -- interface ---------------------------------------------------------
    def rand(self, key, shape: Shape = ()) -> jax.Array:
        """Sample uniformly from the spec's domain."""
        raise NotImplementedError

    def zero(self, shape: Shape = ()) -> jax.Array:
        return jnp.zeros(_shape(shape) + self.shape, self.dtype)

    def one(self, shape: Shape = ()) -> jax.Array:
        return jnp.ones(_shape(shape) + self.shape, self.dtype)

    def is_in(self, val) -> bool:
        """Host-side membership check (shape, dtype, domain)."""
        raise NotImplementedError

    def project(self, val) -> jax.Array:
        """Map ``val`` onto the spec's domain (jittable)."""
        raise NotImplementedError

    def encode(self, val) -> jax.Array:
        """Convert a raw value (e.g. numpy from a host env) to spec format."""
        return jnp.asarray(val, self.dtype)

    def expand(self, *batch_shape) -> "TensorSpec":
        raise NotImplementedError

    def clone(self) -> "TensorSpec":
        return self.expand(*self.shape[: len(self.shape) - len(self._leaf_shape())])

    def _leaf_shape(self) -> Shape:
        return self.shape

    def to_shape_dtype(self) -> jax.ShapeDtypeStruct:
        return jax.ShapeDtypeStruct(self.shape, self.dtype)

    def _check_shape_dtype(self, val) -> bool:
        val = np.asarray(val)
        if val.shape[len(val.shape) - len(self.shape):] != self.shape:
            return False
        return True

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.shape == other.shape
            and self.dtype == other.dtype
            and self._domain_eq(other)
        )

    def _domain_eq(self, other) -> bool:
        return True

    def __repr__(self):
        return f"{type(self).__name__}(shape={self.shape}, dtype={self.dtype})"


class Bounded(TensorSpec):
    """Box-bounded continuous/discrete spec. Reference: tensor_specs.py:2259."""

    def __init__(self, low=-1.0, high=1.0, shape=(), dtype=jnp.float32):
        super().__init__(shape, dtype)
        self.low = np.broadcast_to(np.asarray(low, self.dtype), self.shape).copy()
        self.high = np.broadcast_to(np.asarray(high, self.dtype), self.shape).copy()

    def rand(self, key, shape: Shape = ()):
        full = _shape(shape) + self.shape
        if jnp.issubdtype(self.dtype, jnp.integer):
            return jax.random.randint(
                key, full, jnp.asarray(self.low), jnp.asarray(self.high) + 1, self.dtype
            )
        u = jax.random.uniform(key, full, self.dtype)
        low, high = jnp.asarray(self.low), jnp.asarray(self.high)
        return low + u * (high - low)

    def is_in(self, val) -> bool:
        v = np.asarray(val)
        if not self._check_shape_dtype(v):
            return False
        return bool(np.all(v >= self.low - 1e-6) and np.all(v <= self.high + 1e-6))

    def project(self, val):
        return jnp.clip(val, jnp.asarray(self.low), jnp.asarray(self.high))

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return Bounded(
            np.broadcast_to(self.low, bs + self.shape),
            np.broadcast_to(self.high, bs + self.shape),
            bs + self.shape,
            self.dtype,
        )

    def _domain_eq(self, other):
        return np.array_equal(self.low, other.low) and np.array_equal(self.high, other.high)

    def __repr__(self):
        return (
            f"Bounded(shape={self.shape}, dtype={self.dtype}, "
            f"low={np.min(self.low):g}, high={np.max(self.high):g})"
        )


class Unbounded(TensorSpec):
    """Unbounded spec. Reference: tensor_specs.py:3053."""

    def rand(self, key, shape: Shape = ()):
        full = _shape(shape) + self.shape
        if jnp.issubdtype(self.dtype, jnp.integer):
            info = jnp.iinfo(self.dtype)
            return jax.random.randint(key, full, info.min // 2, info.max // 2, self.dtype)
        if self.dtype == jnp.bool_:
            return jax.random.bernoulli(key, 0.5, full)
        return jax.random.normal(key, full, self.dtype)

    def is_in(self, val) -> bool:
        return self._check_shape_dtype(val)

    def project(self, val):
        return jnp.asarray(val, self.dtype)

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return type(self)(bs + self.shape, self.dtype)


class UnboundedContinuous(Unbounded):
    """Reference: tensor_specs.py:3277."""


class UnboundedDiscrete(Unbounded):
    """Reference: tensor_specs.py:3283."""

    def __init__(self, shape=(), dtype=jnp.int32):
        super().__init__(shape, dtype)


class Categorical(TensorSpec):
    """Integer action space in ``[0, n)``. Reference: tensor_specs.py:3808.

    ``shape`` is the shape of the *index tensor* (usually ``()``).
    """

    def __init__(self, n: int, shape=(), dtype=jnp.int32):
        super().__init__(shape, dtype)
        self.n = int(n)

    @property
    def space_n(self) -> int:
        return self.n

    def rand(self, key, shape: Shape = ()):
        return jax.random.randint(key, _shape(shape) + self.shape, 0, self.n, self.dtype)

    def is_in(self, val) -> bool:
        v = np.asarray(val)
        if not self._check_shape_dtype(v):
            return False
        return bool(np.all(v >= 0) and np.all(v < self.n))

    def project(self, val):
        return jnp.clip(jnp.asarray(val, self.dtype), 0, self.n - 1)

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return Categorical(self.n, bs + self.shape, self.dtype)

    def _domain_eq(self, other):
        return self.n == other.n

    def to_one_hot_spec(self) -> "OneHot":
        return OneHot(self.n, self.shape + (self.n,), dtype=jnp.bool_)

    def __repr__(self):
        return f"Categorical(n={self.n}, shape={self.shape}, dtype={self.dtype})"


class MultiCategorical(TensorSpec):
    """Vector of categoricals with per-dim cardinality. Reference: tensor_specs.py:4600."""

    def __init__(self, nvec: Sequence[int], shape=None, dtype=jnp.int32):
        nvec = np.asarray(nvec, np.int32)
        if shape is None:
            shape = nvec.shape
        super().__init__(shape, dtype)
        self.nvec = np.broadcast_to(nvec, self.shape).copy()

    def rand(self, key, shape: Shape = ()):
        full = _shape(shape) + self.shape
        u = jax.random.uniform(key, full)
        return jnp.floor(u * jnp.asarray(self.nvec)).astype(self.dtype)

    def is_in(self, val) -> bool:
        v = np.asarray(val)
        if not self._check_shape_dtype(v):
            return False
        return bool(np.all(v >= 0) and np.all(v < self.nvec))

    def project(self, val):
        return jnp.clip(jnp.asarray(val, self.dtype), 0, jnp.asarray(self.nvec) - 1)

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return MultiCategorical(
            np.broadcast_to(self.nvec, bs + self.shape), bs + self.shape, self.dtype
        )

    def _domain_eq(self, other):
        return np.array_equal(self.nvec, other.nvec)


class OneHot(TensorSpec):
    """One-hot encoded categorical; last dim is the category axis.

    Reference: tensor_specs.py:1695.
    """

    def __init__(self, n: int, shape=None, dtype=jnp.bool_):
        n = int(n)
        if shape is None:
            shape = (n,)
        shape = _shape(shape)
        if shape[-1] != n:
            raise ValueError(f"OneHot last dim {shape[-1]} != n {n}")
        super().__init__(shape, dtype)
        self.n = n

    def rand(self, key, shape: Shape = ()):
        idx = jax.random.randint(key, _shape(shape) + self.shape[:-1], 0, self.n)
        return jax.nn.one_hot(idx, self.n, dtype=self.dtype)

    def is_in(self, val) -> bool:
        v = np.asarray(val)
        if not self._check_shape_dtype(v):
            return False
        return bool(np.all(v.astype(np.int64).sum(-1) == 1))

    def project(self, val):
        idx = jnp.argmax(jnp.asarray(val), axis=-1)
        return jax.nn.one_hot(idx, self.n, dtype=self.dtype)

    def encode(self, val):
        """Encode integer indices to one-hot."""
        val = jnp.asarray(val)
        if val.shape and val.shape[-1] == self.n and not jnp.issubdtype(val.dtype, jnp.integer):
            return val.astype(self.dtype)
        return jax.nn.one_hot(val, self.n, dtype=self.dtype)

    def to_categorical_spec(self) -> Categorical:
        return Categorical(self.n, self.shape[:-1])

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return OneHot(self.n, bs + self.shape, self.dtype)

    def _domain_eq(self, other):
        return self.n == other.n

    def __repr__(self):
        return f"OneHot(n={self.n}, shape={self.shape}, dtype={self.dtype})"


class MultiOneHot(TensorSpec):
    """Concatenated one-hot groups. Reference: tensor_specs.py:3298."""

    def __init__(self, nvec: Sequence[int], shape=None, dtype=jnp.bool_):
        self.nvec = tuple(int(n) for n in nvec)
        total = sum(self.nvec)
        if shape is None:
            shape = (total,)
        shape = _shape(shape)
        if shape[-1] != total:
            raise ValueError(f"MultiOneHot last dim {shape[-1]} != sum(nvec) {total}")
        super().__init__(shape, dtype)

    def rand(self, key, shape: Shape = ()):
        keys = jax.random.split(key, len(self.nvec))
        parts = []
        batch = _shape(shape) + self.shape[:-1]
        for k, n in zip(keys, self.nvec):
            idx = jax.random.randint(k, batch, 0, n)
            parts.append(jax.nn.one_hot(idx, n, dtype=self.dtype))
        return jnp.concatenate(parts, axis=-1)

    def is_in(self, val) -> bool:
        v = np.asarray(val)
        if not self._check_shape_dtype(v):
            return False
        start = 0
        for n in self.nvec:
            if not np.all(v[..., start:start + n].astype(np.int64).sum(-1) == 1):
                return False
            start += n
        return True

    def project(self, val):
        val = jnp.asarray(val)
        parts = []
        start = 0
        for n in self.nvec:
            idx = jnp.argmax(val[..., start:start + n], axis=-1)
            parts.append(jax.nn.one_hot(idx, n, dtype=self.dtype))
            start += n
        return jnp.concatenate(parts, axis=-1)

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return MultiOneHot(self.nvec, bs + self.shape, self.dtype)

    def _domain_eq(self, other):
        return self.nvec == other.nvec


class Binary(TensorSpec):
    """Binary vector spec. Reference: tensor_specs.py:4398."""

    def __init__(self, n: int | None = None, shape=None, dtype=jnp.bool_):
        if shape is None:
            shape = (n,) if n else ()
        shape = _shape(shape)
        super().__init__(shape, dtype)
        self.n = shape[-1] if shape else (n or 0)

    def rand(self, key, shape: Shape = ()):
        return jax.random.bernoulli(key, 0.5, _shape(shape) + self.shape).astype(self.dtype)

    def is_in(self, val) -> bool:
        v = np.asarray(val)
        if not self._check_shape_dtype(v):
            return False
        return bool(np.all((v == 0) | (v == 1)))

    def project(self, val):
        return (jnp.asarray(val) > 0.5).astype(self.dtype)

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return Binary(self.n, bs + self.shape, self.dtype)


class NonTensor(TensorSpec):
    """Host-side objects (strings, …). Reference: tensor_specs.py:2738.

    On TPU these never enter jit; they flow on the host side of collectors
    (e.g. LLM text).  ``rand``/``zero`` return the example object.
    """

    def __init__(self, shape=(), example: Any = None):
        self.shape = _shape(shape)
        self.dtype = None
        self.example = example

    def rand(self, key=None, shape: Shape = ()):
        return self.example

    def zero(self, shape: Shape = ()):
        return self.example

    def one(self, shape: Shape = ()):
        return self.example

    def is_in(self, val) -> bool:
        return True

    def project(self, val):
        return val

    def expand(self, *batch_shape):
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        return NonTensor(bs + self.shape, self.example)


class Choice(TensorSpec):
    """Union-of-specs; host-side sampling only. Reference: tensor_specs.py:4243."""

    def __init__(self, specs: Sequence[TensorSpec]):
        self.specs = list(specs)
        self.shape = self.specs[0].shape
        self.dtype = self.specs[0].dtype

    def rand(self, key, shape: Shape = ()):
        idx = int(jax.random.randint(key, (), 0, len(self.specs)))
        return self.specs[idx].rand(key, shape)

    def is_in(self, val) -> bool:
        return any(s.is_in(val) for s in self.specs)

    def project(self, val):
        return self.specs[0].project(val)

    def expand(self, *batch_shape):
        return Choice([s.expand(*batch_shape) for s in self.specs])


class Composite:
    """Nested dict of specs — the env contract type. Reference: tensor_specs.py:5042.

    ``shape`` is the batch shape shared by all contained specs (leading dims).
    """

    def __init__(self, spec_dict: Mapping[NestedKey, Any] | None = None, shape: Shape = (), **kwargs):
        self.shape = _shape(shape)
        self._specs: dict[str, Any] = {}
        merged = dict(spec_dict or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = v

    def __setitem__(self, key: NestedKey, value):
        kk = unravel_key(key)
        if isinstance(value, Mapping) and not isinstance(value, Composite):
            value = Composite(value, shape=self.shape)
        if len(kk) == 1:
            self._specs[kk[0]] = value
        else:
            sub = self._specs.get(kk[0])
            if not isinstance(sub, Composite):
                sub = Composite(shape=self.shape)
                self._specs[kk[0]] = sub
            sub[kk[1:]] = value

    def __getitem__(self, key: NestedKey):
        kk = unravel_key(key)
        node: Any = self
        for part in kk:
            if not isinstance(node, Composite) or part not in node._specs:
                raise KeyError(key)
            node = node._specs[part]
        return node

    def get(self, key: NestedKey, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __contains__(self, key: NestedKey) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    def __delitem__(self, key: NestedKey):
        kk = unravel_key(key)
        if len(kk) == 1:
            del self._specs[kk[0]]
        else:
            del self._specs[kk[0]][kk[1:]]

    def keys(self, include_nested: bool = False, leaves_only: bool = False):
        for k, v in self._specs.items():
            if isinstance(v, Composite) and include_nested:
                if not leaves_only:
                    yield k
                for sub in v.keys(include_nested=True, leaves_only=leaves_only):
                    yield (k, *unravel_key(sub))
            else:
                yield k

    def items(self, include_nested: bool = False, leaves_only: bool = False):
        for k in self.keys(include_nested, leaves_only):
            yield k, self[k]

    def values(self, include_nested: bool = False, leaves_only: bool = False):
        for k in self.keys(include_nested, leaves_only):
            yield self[k]

    def __iter__(self):
        return iter(self._specs)

    def __len__(self):
        return len(self._specs)

    def is_empty(self) -> bool:
        return len(self._specs) == 0

    # -- TensorSpec-like interface over TDicts -----------------------------
    def rand(self, key, shape: Shape = ()) -> TDict:
        leaves = list(self.keys(include_nested=True, leaves_only=True))
        keys = jax.random.split(key, max(len(leaves), 1))
        out = TDict()
        for k, sub in zip(leaves, keys):
            out = out.set(k, self[k].rand(sub, shape))
        return out

    def zero(self, shape: Shape = ()) -> TDict:
        out = TDict()
        for k in self.keys(include_nested=True, leaves_only=True):
            out = out.set(k, self[k].zero(shape))
        return out

    def one(self, shape: Shape = ()) -> TDict:
        out = TDict()
        for k in self.keys(include_nested=True, leaves_only=True):
            out = out.set(k, self[k].one(shape))
        return out

    def is_in(self, td: TDict) -> bool:
        for k in self.keys(include_nested=True, leaves_only=True):
            if isinstance(self[k], NonTensor):
                continue
            if k not in td or not self[k].is_in(td[k]):
                return False
        return True

    def project(self, td: TDict) -> TDict:
        out = td
        for k in self.keys(include_nested=True, leaves_only=True):
            out = out.set(k, self[k].project(td[k]))
        return out

    def expand(self, *batch_shape) -> "Composite":
        bs = _shape(batch_shape[0]) if len(batch_shape) == 1 and not isinstance(batch_shape[0], int) else _shape(batch_shape)
        out = Composite(shape=bs + self.shape)
        for k, v in self._specs.items():
            out._specs[k] = v.expand(bs)
        return out

    def update(self, other: "Composite") -> "Composite":
        for k, v in other._specs.items():
            if k in self._specs and isinstance(self._specs[k], Composite) and isinstance(v, Composite):
                self._specs[k].update(v)
            else:
                self._specs[k] = v
        return self

    def clone(self) -> "Composite":
        out = Composite(shape=self.shape)
        for k, v in self._specs.items():
            out._specs[k] = v.clone() if isinstance(v, Composite) else v
        return out

    def select(self, *keys: NestedKey) -> "Composite":
        out = Composite(shape=self.shape)
        for k in keys:
            out[k] = self[k]
        return out

    def exclude(self, *keys: NestedKey) -> "Composite":
        out = self.clone()
        for k in keys:
            if k in out:
                del out[k]
        return out

    def __eq__(self, other):
        if not isinstance(other, Composite):
            return NotImplemented
        ka = set(self.keys(include_nested=True, leaves_only=True))
        kb = set(other.keys(include_nested=True, leaves_only=True))
        if ka != kb:
            return False
        return all(self[k] == other[k] for k in ka)

    def __repr__(self):
        inner = ", ".join(f"{k}: {v!r}" for k, v in self._specs.items())
        return f"Composite({{{inner}}}, shape={self.shape})"


def make_composite_from_td(td: TDict, unsqueeze_null_shapes: bool = True) -> Composite:
    """Build an Unbounded Composite matching a TDict's structure.

    Reference: envs/utils.py:928 ``make_composite_from_td``.
    """
    out = Composite()
    for k, v in td.items(include_nested=True, leaves_only=True):
        v = jnp.asarray(v)
        out[k] = Unbounded(v.shape, v.dtype)
    return out


def consolidate_spec(specs: Sequence[Composite]) -> Composite:
    """Merge a list of (possibly heterogeneous) Composites by padding leaf
    shapes to the per-key max.  Reference: data/utils.py:74."""
    out = Composite()
    all_keys: dict[tuple, list] = {}
    for spec in specs:
        for k in spec.keys(include_nested=True, leaves_only=True):
            all_keys.setdefault(unravel_key(k), []).append(spec[k])
    for k, leaf_specs in all_keys.items():
        shapes = [s.shape for s in leaf_specs]
        ndim = max(len(s) for s in shapes)
        padded = [(1,) * (ndim - len(s)) + s for s in shapes]
        max_shape = tuple(max(dims) for dims in zip(*padded)) if padded else ()
        s0 = leaf_specs[0]
        out[k] = Unbounded(max_shape, s0.dtype)
    return out
