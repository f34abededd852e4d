"""Opt-in profiling ranges, gated by ``RLTPU_PROFILING``.

TPU counterpart of the reference profiling gate
(``/root/reference/torchrl/_utils.py:433-515`` + docs/source/reference/
profiling.rst): zero-cost no-ops when disabled; when enabled, sites become
``jax.profiler.TraceAnnotation`` ranges visible in TensorBoard/xprof traces.
"""
from __future__ import annotations

import contextlib
import os
from typing import Any

import jax

__all__ = [
    "profiling_enabled",
    "set_profiling_enabled",
    "maybe_named_scope",
    "trace_to",
    "device_memory_stats",
]

_PROFILING = os.environ.get("RLTPU_PROFILING", "0") not in ("0", "", "false", "False")


def profiling_enabled() -> bool:
    return _PROFILING


def set_profiling_enabled(value: bool) -> None:
    global _PROFILING
    _PROFILING = bool(value)


def maybe_named_scope(name: str):
    """Context manager: ``jax.named_scope``/TraceAnnotation when profiling, no-op otherwise."""
    if not _PROFILING:
        return contextlib.nullcontext()
    return jax.profiler.TraceAnnotation(name)


def trace_to(logdir: str):
    """``with trace_to("/tmp/trace"):`` — captures an xprof trace."""
    return jax.profiler.trace(logdir)


def device_memory_stats(device=None) -> dict[str, Any]:
    """Device HBM stats (reference: ``cuda_memory_stats`` _utils.py:1398)."""
    if device is None:
        device = jax.local_devices()[0]
    stats = device.memory_stats()
    return dict(stats) if stats else {}
