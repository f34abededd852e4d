"""Pull-based operational monitoring — ``Every`` schedules + ``LoggerMonitor``.

Counterpart of ``/root/reference/torchrl/record/loggers/monitoring.py``
(``Every`` :31, ``LoggerMonitor`` :128): watched objects expose a cheap
``stats()`` snapshot of scalar counters; the monitor polls them off the hot
path, applies per-target schedules, derives ``<counter>_per_s`` rates from
cumulative deltas, namespaces metrics as ``<name>/<metric>`` and forwards
them to one logger.  Collectors (``frames_collected``) and replay buffers
(``len``) satisfy the protocol.
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass

__all__ = ["Every", "LoggerMonitor"]


@dataclass(frozen=True)
class Every:
    """A logging schedule: build via :meth:`seconds` or :meth:`counter`."""

    kind: str = "seconds"
    interval: float = 10.0
    counter_key: str | None = None

    @classmethod
    def seconds(cls, interval: float) -> "Every":
        """Trigger on wall-clock time."""
        return cls("seconds", float(interval), None)

    @classmethod
    def counter(cls, key: str, interval: float) -> "Every":
        """Trigger when the cumulative counter ``key`` in ``stats()``
        crosses a multiple of ``interval``.  Jumps over several thresholds
        log once; a decrease (reset/restore) re-baselines."""
        return cls("counter", float(interval), key)


class _Watched:
    def __init__(self, obj, name: str, every: Every):
        self.obj = obj
        self.name = name
        self.every = every
        self.last_time = 0.0
        self.last_counter: float | None = None
        self.prev_stats: dict | None = None
        self.prev_stamp: float | None = None

    def due(self, stats: dict, now: float) -> bool:
        ev = self.every
        if ev.kind == "seconds":
            if now - self.last_time >= ev.interval:
                self.last_time = now
                return True
            return False
        cur = float(stats.get(ev.counter_key, 0.0))
        if self.last_counter is None or cur < self.last_counter:
            self.last_counter = cur  # baseline (start or reset)
            return False
        if cur // self.every.interval > self.last_counter // self.every.interval:
            self.last_counter = cur
            return True
        return False


class LoggerMonitor:
    """Poll ``stats()`` snapshots of watched objects into a logger.

    No logging work runs on the watched objects' hot paths; a slow backend
    only delays the next poll.  The monitor owns neither the logger nor the
    watched objects.
    """

    def __init__(self, logger, *, poll_interval: float = 1.0,
                 background: bool = True):
        self.logger = logger
        self.poll_interval = float(poll_interval)
        self.background = background
        self._watched: list[_Watched] = []
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._step_count = 0

    def watch(self, obj, name: str, every: Every | None = None) -> None:
        """Register ``obj`` (anything with a ``stats() -> dict`` method)."""
        if not hasattr(obj, "stats"):
            raise TypeError(f"{name}: watched objects need a stats() method")
        self._watched.append(_Watched(obj, name, every or Every.seconds(10.0)))

    def step(self, now: float | None = None) -> int:
        """One poll of every watched object; returns #targets logged."""
        now = time.monotonic() if now is None else now
        logged = 0
        for w in self._watched:
            try:
                stats = dict(w.obj.stats())
            except Exception:
                continue  # watched object mid-shutdown: skip this poll
            if not w.due(stats, now):
                continue
            out = dict(stats)
            if w.prev_stats is not None and w.prev_stamp is not None:
                dt = max(now - w.prev_stamp, 1e-9)
                for k, v in stats.items():
                    pv = w.prev_stats.get(k)
                    if (isinstance(v, (int, float))
                            and isinstance(pv, (int, float)) and v >= pv):
                        out[f"{k}_per_s"] = (v - pv) / dt
            w.prev_stats, w.prev_stamp = stats, now
            for k, v in out.items():
                if isinstance(v, (int, float)):
                    self.logger.log_scalar(f"{w.name}/{k}", float(v),
                                           step=self._step_count)
            logged += 1
        self._step_count += 1
        return logged

    def start(self) -> None:
        if not self.background:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                self.step()
                self._stop.wait(self.poll_interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
