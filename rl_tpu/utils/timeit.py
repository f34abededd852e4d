"""Global named-timer registry for cheap always-on phase timing.

TPU-native counterpart of the reference ``timeit`` utility
(``/root/reference/torchrl/_utils.py:221-411``): context manager / decorator,
aggregate ``print()``, ``todict()``, ``printevery()``.

Note: JAX dispatch is async — timings of jitted calls measure dispatch unless
the caller block-until-ready's.  ``timeit(..., sync=True)`` inserts a
``jax.block_until_ready`` barrier on exit for wall-accurate numbers.
"""
from __future__ import annotations

import functools
import time
from collections import defaultdict
from typing import Any, Callable

import jax

__all__ = ["timeit"]


class timeit:
    """``with timeit("collect"): ...`` or ``@timeit("collect")``."""

    _REGISTRY: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])
    _count_printevery: dict[str, int] = defaultdict(int)

    def __init__(self, name: str, sync: bool = False):
        self.name = name
        self.sync = sync

    def __call__(self, fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with timeit(self.name, sync=self.sync):
                return fn(*args, **kwargs)

        return wrapper

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        dt = time.perf_counter() - self.t0
        entry = self._REGISTRY[self.name]
        entry[0] += dt
        entry[1] += 1

    # -- registry ----------------------------------------------------------
    @classmethod
    def todict(cls, percall: bool = True, prefix: str | None = None) -> dict[str, float]:
        out = {}
        for name, (total, count) in cls._REGISTRY.items():
            if prefix and not name.startswith(prefix):
                continue
            out[name] = (total / max(count, 1)) if percall else total
        return out

    @classmethod
    def print(cls, prefix: str | None = None) -> None:  # noqa: A003
        vals = cls.todict(percall=False, prefix=prefix)
        total_all = sum(vals.values()) or 1.0
        for name, total in sorted(vals.items(), key=lambda kv: -kv[1]):
            count = cls._REGISTRY[name][1]
            print(
                f"{name}: total={total:.4f}s, calls={count}, "
                f"percall={total / max(count, 1) * 1e3:.3f}ms, share={total / total_all:.1%}"
            )

    @classmethod
    def printevery(cls, num_prints: int, total_count: int, prefix: str | None = None,
                   erase: bool = False) -> None:
        key = prefix or "__all__"
        cls._count_printevery[key] += 1
        interval = max(total_count // max(num_prints, 1), 1)
        if cls._count_printevery[key] % interval == 0:
            cls.print(prefix=prefix)
            if erase:
                cls.erase(prefix=prefix)

    @classmethod
    def erase(cls, prefix: str | None = None) -> None:
        if prefix is None:
            cls._REGISTRY.clear()
        else:
            for k in [k for k in cls._REGISTRY if k.startswith(prefix)]:
                del cls._REGISTRY[k]
