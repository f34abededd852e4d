"""Environment hygiene for spawning CPU-only worker processes.

Worker interpreters re-run site hooks at startup; in this container a
``sitecustomize`` force-registers a TPU PJRT plugin that claims a
single-session TPU tunnel.  A fleet of CPU env/collector workers must
never touch it: each claim attempt blocks for the grant timeout
(observed: ~80 s per worker → a 7 s multiproc test taking 170 s).  The
reference's counterpart concern is CUDA context creation in forked
workers (torchrl _utils.py mp start-method handling).
"""
from __future__ import annotations

import contextlib
import os

__all__ = ["cpu_worker_env"]

# env vars that make a freshly spawned interpreter CPU-only, including
# disabling PJRT plugin auto-registration hooks
_CPU_OVERRIDES = {
    "JAX_PLATFORMS": "cpu",
    "RLTPU_DEVICE": "cpu",
    "PALLAS_AXON_POOL_IPS": "",  # gates this container's TPU site hook
}


@contextlib.contextmanager
def cpu_worker_env():
    """Temporarily set the CPU-worker env; spawn children inside this
    block (``mp.Process.start()`` snapshots ``os.environ``)."""
    saved = {k: os.environ.get(k) for k in _CPU_OVERRIDES}
    os.environ.update(_CPU_OVERRIDES)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
