"""Batching inference server — decouple acting from policy execution.

Counterpart of ``/root/reference/torchrl/modules/inference_server/``:
``InferenceServer`` _server.py:261 (batch requests from many client actors
into one forward pass), ``PolicyClientModule`` _client.py:114 (drop-in
policy returning results), threading transport _threading.py:16.

On TPU this is how host-side env workers (gym pools, LLM loops) share one
device policy efficiently: requests accumulate up to ``max_batch_size`` or
``timeout_ms``, run as a single jitted batched forward, and scatter back.
"""
from __future__ import annotations

import threading
import time
from typing import Any, Callable

import jax
import numpy as np

from rl_tpu.data import TDict

__all__ = ["InferenceServer", "PolicyClient"]


class InferenceServer:
    """``policy(params, obs_batch, key) -> action_batch`` micro-batching.

    ``policy`` must accept a leading batch axis.  Clients call
    :meth:`query` (blocking) from their own threads.
    """

    def __init__(self, policy: Callable, params, *, max_batch_size: int = 64,
                 timeout_ms: float = 2.0, seed: int = 0):
        self.policy = policy
        self.params = params
        self.max_batch_size = int(max_batch_size)
        self.timeout_s = timeout_ms / 1e3
        self._key = jax.random.PRNGKey(seed)
        self._pending: list[tuple[Any, list, threading.Event]] = []
        self._lock = threading.Condition()
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        self.batches_run = 0
        self.requests_served = 0

    # -- client side --------------------------------------------------------
    def query(self, obs: Any) -> Any:
        box: list = []
        done = threading.Event()
        with self._lock:
            self._pending.append((obs, box, done))
            self._lock.notify()
        done.wait()
        out = box[0]
        if isinstance(out, Exception):
            raise out
        return out

    def update_weights(self, params) -> None:
        self.params = params

    # -- server side --------------------------------------------------------
    def _serve(self):
        while self._running:
            with self._lock:
                if not self._pending:
                    self._lock.wait(timeout=0.05)
                    continue
                deadline = time.monotonic() + self.timeout_s
                while (
                    len(self._pending) < self.max_batch_size
                    and time.monotonic() < deadline
                ):
                    self._lock.wait(timeout=max(deadline - time.monotonic(), 0))
                batch = self._pending[: self.max_batch_size]
                self._pending = self._pending[self.max_batch_size:]
            try:
                obs = jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *[b[0] for b in batch],
                )
                self._key, k = jax.random.split(self._key)
                actions = self.policy(self.params, obs, k)
                actions = jax.device_get(actions)
                for i, (_, box, done) in enumerate(batch):
                    box.append(jax.tree.map(lambda a: a[i], actions))
                    done.set()
                self.batches_run += 1
                self.requests_served += len(batch)
            except Exception as e:
                for _, box, done in batch:
                    box.append(e)
                    done.set()

    def close(self):
        self._running = False
        self._thread.join(timeout=1.0)


class PolicyClient:
    """Drop-in callable policy backed by a server (reference _client.py:114)."""

    def __init__(self, server: InferenceServer):
        self.server = server

    def __call__(self, obs):
        return self.server.query(obs)
