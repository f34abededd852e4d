"""Hyperparameter schedulers for samplers (anneal α/β).

Counterpart of ``/root/reference/torchrl/data/replay_buffers/scheduler.py``:
``ParameterScheduler`` :17, ``LambdaScheduler`` :93, plus a linear
convenience (the common β → 1 anneal).
"""
from __future__ import annotations

from typing import Callable

__all__ = ["ParameterScheduler", "LambdaScheduler", "LinearScheduler"]


class ParameterScheduler:
    """Drive an attribute of a sampler (e.g. ``beta``) across steps."""

    def __init__(self, obj, attr: str, schedule: Callable[[int], float]):
        self.obj = obj
        self.attr = attr
        self.schedule = schedule
        self._step = 0

    def step(self, n: int = 1) -> float:
        self._step += n
        value = float(self.schedule(self._step))
        setattr(self.obj, self.attr, value)
        return value

    @property
    def value(self) -> float:
        return float(getattr(self.obj, self.attr))


class LambdaScheduler(ParameterScheduler):
    """Multiply the initial value by ``fn(step)`` (reference :93)."""

    def __init__(self, obj, attr: str, fn: Callable[[int], float]):
        init = float(getattr(obj, attr))
        super().__init__(obj, attr, lambda s: init * fn(s))


class LinearScheduler(ParameterScheduler):
    """Linear ramp from the current value to ``final`` over ``num_steps``."""

    def __init__(self, obj, attr: str, final: float, num_steps: int):
        init = float(getattr(obj, attr))

        def sched(s):
            frac = min(s / max(num_steps, 1), 1.0)
            return init + (final - init) * frac

        super().__init__(obj, attr, sched)
