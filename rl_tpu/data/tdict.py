"""TDict — the TPU-native structured batch container.

This is the framework's replacement for TorchRL's ``TensorDict`` (the external
``tensordict`` dependency; see reference README.md:75-84): a nested, named
container of arrays that every component consumes and produces.  Unlike
TensorDict it is

* a **registered JAX pytree** — it flows through ``jit`` / ``vmap`` /
  ``lax.scan`` / ``pjit`` transparently,
* **immutable / functional** — every mutator returns a new TDict,
* **batch-metadata free** — batch dims are positional (leading), so ``vmap``
  and ``scan`` adding/removing leading axes never desynchronise metadata.

Keys mirror TorchRL's nested-key convention: a key is a ``str`` or a tuple of
``str`` (e.g. ``("next", "reward")``, ``("agents", "observation")``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from typing import Any, Callable, Iterable, Iterator, Mapping, Sequence

__all__ = ["TDict", "NestedKey", "is_leaf_key", "unravel_key"]

NestedKey = Any  # str | tuple[str, ...]


def unravel_key(key: NestedKey) -> tuple[str, ...]:
    """Normalize a key to a tuple of strings.

    ``"a"`` -> ``("a",)``; ``("a", "b")`` -> ``("a", "b")``;
    ``("a", ("b", "c"))`` -> ``("a", "b", "c")``.
    """
    if isinstance(key, str):
        return (key,)
    if isinstance(key, (tuple, list)):  # lists: YAML configs can't spell tuples
        out: list[str] = []
        for part in key:
            out.extend(unravel_key(part))
        return tuple(out)
    raise TypeError(f"Invalid key type: {type(key)}")


def is_leaf_key(key: Any) -> bool:
    """True if ``key`` addresses entries (str or tuple/list of str), not an
    index.  Lists qualify only when every element is itself a leaf key —
    a list of ints stays an array index (YAML-sourced nested keys arrive
    as lists of strings)."""
    if isinstance(key, str):
        return True
    if isinstance(key, (tuple, list)):
        return len(key) > 0 and all(is_leaf_key(k) for k in key)
    return False


def _wrap(value: Any) -> Any:
    if isinstance(value, TDict):
        return value
    if isinstance(value, Mapping):
        return TDict(value)
    return value


class TDict:
    """An immutable nested mapping of names to arrays, registered as a pytree.

    Examples
    --------
    >>> td = TDict({"obs": jnp.zeros((4, 3)), "next": {"reward": jnp.ones((4, 1))}})
    >>> td["obs"].shape
    (4, 3)
    >>> td["next", "reward"].shape
    (4, 1)
    >>> td2 = td.set(("next", "done"), jnp.zeros((4, 1), bool))
    >>> td[0]          # batch-indexes every leaf
    """

    __slots__ = ("_data",)

    def __init__(self, data: Mapping[str, Any] | None = None, /, **kwargs: Any):
        merged: dict[str, Any] = {}
        if data is not None:
            for k, v in data.items():
                kk = unravel_key(k)
                if len(kk) == 1:
                    merged[kk[0]] = _wrap(v)
                else:
                    sub = merged.get(kk[0])
                    sub_d = dict(sub._data) if isinstance(sub, TDict) else {}
                    sub_d[kk[1:]] = v
                    merged[kk[0]] = TDict(sub_d)
        for k, v in kwargs.items():
            merged[k] = _wrap(v)
        object.__setattr__(self, "_data", merged)

    # -- mapping interface -------------------------------------------------
    def __getitem__(self, key: Any) -> Any:
        if is_leaf_key(key):
            kk = unravel_key(key)
            node: Any = self
            for part in kk:
                if not isinstance(node, TDict) or part not in node._data:
                    raise KeyError(key)
                node = node._data[part]
            return node
        # batch indexing: apply to every leaf
        return self.apply(lambda x: x[key])

    def get(self, key: NestedKey, default: Any = ...) -> Any:
        try:
            return self[key]
        except KeyError:
            if default is ...:
                raise
            return default

    def __contains__(self, key: NestedKey) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    def keys(self, include_nested: bool = False, leaves_only: bool = False):
        if not include_nested:
            yield from self._data.keys()
            return
        for k, v in self._data.items():
            if isinstance(v, TDict):
                if not leaves_only:
                    yield k
                for sub in v.keys(include_nested=True, leaves_only=leaves_only):
                    sub = unravel_key(sub)
                    yield (k, *sub)
            else:
                yield k

    def items(self, include_nested: bool = False, leaves_only: bool = False):
        for k in self.keys(include_nested, leaves_only):
            yield k, self[k]

    def values(self, include_nested: bool = False, leaves_only: bool = False):
        for k in self.keys(include_nested, leaves_only):
            yield self[k]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def is_empty(self) -> bool:
        return len(self._data) == 0

    # -- functional mutation ----------------------------------------------
    def set(self, key: NestedKey, value: Any) -> "TDict":
        kk = unravel_key(key)
        new = dict(self._data)
        if len(kk) == 1:
            new[kk[0]] = _wrap(value)
        else:
            sub = new.get(kk[0])
            if not isinstance(sub, TDict):
                sub = TDict()
            new[kk[0]] = sub.set(kk[1:], value)
        out = TDict.__new__(TDict)
        object.__setattr__(out, "_data", new)
        return out

    def update(self, other: "TDict | Mapping[str, Any]", **kwargs: Any) -> "TDict":
        """Recursive merge; ``other`` wins on conflicts."""
        out = self
        if isinstance(other, TDict):
            items: Iterable = other._data.items()
        else:
            items = other.items()
        for k, v in items:
            kk = unravel_key(k)
            if len(kk) == 1 and isinstance(v, (TDict, Mapping)):
                cur = out.get(kk[0], None)
                if isinstance(cur, TDict):
                    out = out.set(kk[0], cur.update(v if isinstance(v, TDict) else TDict(v)))
                else:
                    out = out.set(kk[0], v)
            else:
                out = out.set(kk, v)
        for k, v in kwargs.items():
            out = out.set(k, v)
        return out

    def exclude(self, *keys: NestedKey) -> "TDict":
        out = self
        for key in keys:
            out = out._exclude_one(unravel_key(key))
        return out

    def _exclude_one(self, kk: tuple[str, ...]) -> "TDict":
        if kk[0] not in self._data:
            return self
        new = dict(self._data)
        if len(kk) == 1:
            del new[kk[0]]
        else:
            sub = new[kk[0]]
            if isinstance(sub, TDict):
                new[kk[0]] = sub._exclude_one(kk[1:])
        out = TDict.__new__(TDict)
        object.__setattr__(out, "_data", new)
        return out

    def select(self, *keys: NestedKey, strict: bool = True) -> "TDict":
        out = TDict()
        for key in keys:
            try:
                out = out.set(key, self[key])
            except KeyError:
                if strict:
                    raise
        return out

    def rename_key(self, old: NestedKey, new: NestedKey) -> "TDict":
        val = self[old]
        return self.exclude(old).set(new, val)

    def flatten_keys(self, sep: str = ".") -> "TDict":
        out = TDict()
        for k, v in self.items(include_nested=True, leaves_only=True):
            name = sep.join(unravel_key(k))
            out = out.set(name, v)
        return out

    def unflatten_keys(self, sep: str = ".") -> "TDict":
        out = TDict()
        for k, v in self._data.items():
            out = out.set(tuple(k.split(sep)), v)
        return out

    # -- tree ops ----------------------------------------------------------
    def apply(self, fn: Callable, *others: "TDict") -> "TDict":
        """Map ``fn`` over leaves (zipped with ``others`` if given)."""
        return jax.tree.map(fn, self, *others)

    def named_apply(self, fn: Callable[[tuple[str, ...], Any], Any]) -> "TDict":
        out = TDict()
        for k, v in self.items(include_nested=True, leaves_only=True):
            out = out.set(k, fn(unravel_key(k), v))
        return out

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, TDict) else v)
            for k, v in self._data.items()
        }

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "TDict":
        return cls(d)

    # -- shape ops (leading/batch dims) ------------------------------------
    def common_shape(self) -> tuple[int, ...]:
        """Longest common leading shape prefix over all leaves."""
        shapes = [np.shape(v) for v in self.values(include_nested=True, leaves_only=True)]
        if not shapes:
            return ()
        prefix: list[int] = []
        for dims in zip(*shapes):
            if all(d == dims[0] for d in dims):
                prefix.append(dims[0])
            else:
                break
        return tuple(prefix)

    def reshape_batch(self, ndim: int, new_shape: Sequence[int]) -> "TDict":
        """Reshape the first ``ndim`` dims of every leaf to ``new_shape``."""
        def _r(x):
            return jnp.reshape(x, tuple(new_shape) + x.shape[ndim:])
        return self.apply(_r)

    def expand_dims(self, axis: int = 0) -> "TDict":
        return self.apply(lambda x: jnp.expand_dims(x, axis))

    def squeeze(self, axis: int = 0) -> "TDict":
        return self.apply(lambda x: jnp.squeeze(x, axis))

    @staticmethod
    def stack(tds: Sequence["TDict"], axis: int = 0) -> "TDict":
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *tds)

    @staticmethod
    def cat(tds: Sequence["TDict"], axis: int = 0) -> "TDict":
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *tds)

    # -- misc --------------------------------------------------------------
    def astype(self, dtype) -> "TDict":
        return self.apply(lambda x: x.astype(dtype))

    def detach(self) -> "TDict":
        return self.apply(jax.lax.stop_gradient)

    def __eq__(self, other: Any) -> Any:  # leaf-wise equality TDict
        if not isinstance(other, TDict):
            return NotImplemented
        return self.apply(lambda a, b: a == b, other)

    def __repr__(self) -> str:
        def fmt(v: Any, indent: int) -> str:
            pad = " " * indent
            if isinstance(v, TDict):
                inner = ",\n".join(
                    f"{pad}  {k}: {fmt(sv, indent + 2)}" for k, sv in v._data.items()
                )
                return "TDict({\n" + inner + f"\n{pad}}})"
            if hasattr(v, "shape") and hasattr(v, "dtype"):
                return f"{type(v).__name__}(shape={tuple(v.shape)}, dtype={v.dtype})"
            return repr(v)

        return fmt(self, 0)

    def __setattr__(self, name: str, value: Any) -> None:
        raise AttributeError("TDict is immutable; use .set(key, value)")

    # pickle support: __slots__ + blocked __setattr__ break the default
    # protocol, so restore _data via object.__setattr__ explicitly
    def __getstate__(self) -> dict:
        return {"_data": self._data}

    def __setstate__(self, state: dict) -> None:
        object.__setattr__(self, "_data", state["_data"])


def _tdict_flatten_with_keys(td: TDict):
    keys = tuple(sorted(td._data.keys()))
    children = tuple(
        (jax.tree_util.DictKey(k), td._data[k]) for k in keys
    )
    return children, keys


def _tdict_flatten(td: TDict):
    keys = tuple(sorted(td._data.keys()))
    return tuple(td._data[k] for k in keys), keys


def _tdict_unflatten(keys: tuple[str, ...], children: tuple[Any, ...]) -> TDict:
    out = TDict.__new__(TDict)
    object.__setattr__(out, "_data", dict(zip(keys, children)))
    return out


jax.tree_util.register_pytree_with_keys(
    TDict, _tdict_flatten_with_keys, _tdict_unflatten, _tdict_flatten
)
