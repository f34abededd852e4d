"""Batching inference server — decouple acting from policy execution.

Counterpart of ``/root/reference/torchrl/modules/inference_server/``:
``InferenceServer`` _server.py:261 (batch requests from many client actors
into one forward pass), ``ProcessInferenceServer`` _server.py:961 (clients
in OTHER processes), ``PolicyClientModule`` _client.py:114 (drop-in policy
returning results), threading transport _threading.py:16, shared-memory
transport _shared_memory.py:144.

On TPU this is how host-side env workers (gym pools, LLM loops) share one
device policy efficiently: requests accumulate up to ``max_batch_size`` or
``timeout_ms``, run as a single jitted batched forward, and scatter back.
Cross-process clients ride the native shm rings (csrc/shm_ring.cpp): one
SPSC request ring + one response ring per client, raw array bytes, no
pickling on the payload path.
"""
from __future__ import annotations

import threading
import time
from typing import Any, Callable

import jax
import numpy as np

from rl_tpu.data import TDict

__all__ = ["InferenceServer", "PolicyClient", "ProcessInferenceServer",
           "ProcessPolicyClient"]


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


class ProcessInferenceServer:
    """Inference server whose clients live in OTHER processes (reference
    ``ProcessInferenceServer`` _server.py:961 over the shared-memory
    transport _shared_memory.py:144).

    The device policy stays in the owning process; each of ``n_clients``
    worker processes gets a dedicated SPSC shm ring pair
    (``{name}_req_{i}`` / ``{name}_rep_{i}``).  A per-client drainer thread
    feeds requests into the in-process batching :class:`InferenceServer`,
    so concurrent requests from DIFFERENT processes still coalesce into
    one jitted forward.

    Server process::

        srv = ProcessInferenceServer(policy, params, name="pi", n_clients=4)
        ...
        srv.close()

    Worker process ``i``::

        client = ProcessPolicyClient.attach("pi", client_id=i)
        action = client(obs)          # numpy in, numpy out
    """

    def __init__(self, policy: Callable, params, *, name: str,
                 n_clients: int, slot_size: int = 1 << 20, n_slots: int = 8,
                 **server_kwargs):
        from rl_tpu.comm.shm_ring import ShmRing

        self._inner = InferenceServer(policy, params, **server_kwargs)
        self.name = name
        self.n_clients = int(n_clients)
        self._req = [ShmRing.create(f"{name}_req_{i}", slot_size=slot_size,
                                    n_slots=n_slots)
                     for i in range(self.n_clients)]
        self._rep = [ShmRing.create(f"{name}_rep_{i}", slot_size=slot_size,
                                    n_slots=n_slots)
                     for i in range(self.n_clients)]
        self._running = True
        self._threads = [
            threading.Thread(target=self._drain, args=(i,), daemon=True)
            for i in range(self.n_clients)
        ]
        for t in self._threads:
            t.start()

    @property
    def batches_run(self) -> int:
        return self._inner.batches_run

    @property
    def requests_served(self) -> int:
        return self._inner.requests_served

    def update_weights(self, params) -> None:
        self._inner.update_weights(params)

    def _drain(self, i: int) -> None:
        from rl_tpu.comm.shm_ring import encode_array

        while self._running:
            try:
                obs = self._req[i].pop_array(timeout=0.1)
            except TimeoutError:
                continue
            try:
                action = self._inner.query(obs)
                self._rep[i].push_bytes(b"\x00" + encode_array(
                    np.asarray(action)))
            except Exception as e:
                # error frame: status byte 0x01 + utf8 message — the client
                # raises instead of treating it as an action (ADVICE r3 #5)
                msg = f"{type(e).__name__}: {e}".encode()[:4096]
                self._rep[i].push_bytes(b"\x01" + msg)

    def close(self) -> None:
        self._running = False
        for t in self._threads:
            t.join(timeout=1.0)
        self._inner.close()
        for r in self._req + self._rep:
            r.close()


class ProcessPolicyClient:
    """Worker-process side of :class:`ProcessInferenceServer`: a callable
    policy whose forward happens in the server process (reference
    ``PolicyClientModule`` over the shm transport)."""

    def __init__(self, req_ring, rep_ring):
        self._req = req_ring
        self._rep = rep_ring

    @classmethod
    def attach(cls, name: str, client_id: int,
               timeout: float = 10.0) -> "ProcessPolicyClient":
        from rl_tpu.comm.shm_ring import ShmRing

        return cls(ShmRing.attach(f"{name}_req_{client_id}", timeout=timeout),
                   ShmRing.attach(f"{name}_rep_{client_id}", timeout=timeout))

    def __call__(self, obs, *, timeout: float = 30.0) -> np.ndarray:
        from rl_tpu.comm.shm_ring import decode_array

        self._req.push_array(np.asarray(obs), timeout=timeout)
        raw = self._rep.pop_bytes(timeout=timeout)
        if raw[:1] == b"\x01":
            raise RuntimeError(
                "inference server failed: " + raw[1:].decode(errors="replace"))
        return decode_array(raw[1:])

    def close(self) -> None:
        self._req.close()
        self._rep.close()
