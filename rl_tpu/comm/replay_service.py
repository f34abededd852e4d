"""Distributed replay service: a ReplayBuffer served over the control plane.

Counterpart of the reference distributed replay service
(``/root/reference/torchrl/_comm/replay_service.py``:
``_DistributedReplayService`` :102, ``_DistributedReplayClient`` :32).

The service owns a host-side :class:`rl_tpu.data.replay.ReplayBuffer`
(stateful sugar API) and answers ``extend`` / ``sample`` /
``update_priority`` / ``len`` / ``stats`` requests over any
:class:`RequestReplyTransport`.  Collector hosts push transitions; the
learner host samples.  Tensors ride the transport as numpy arrays (host
RAM replay); device-resident replay stays in-process — this service exists
for cross-host buffers, exactly like the reference's.
"""
from __future__ import annotations

import threading
from typing import Any

import numpy as np

from rl_tpu.data import TDict
from .request_reply import (RequestReplyTransport, TCPServer, TCPTransport,
                            ThreadingTransport)

__all__ = ["ReplayService", "DistributedReplayClient"]


def _to_numpy(td: TDict) -> TDict:
    import jax

    return jax.tree.map(lambda x: np.asarray(x), td)


class ReplayService:
    """Serve a replay buffer to remote peers.

    ``transport="tcp"`` starts a :class:`TCPServer` (address at
    ``.address``); ``transport="threading"`` serves in-process (tests,
    thread-based collector fleets).
    """

    def __init__(self, replay_buffer, *, transport: str = "tcp",
                 host: str = "127.0.0.1", port: int = 0):
        self.rb = replay_buffer
        self._lock = threading.Lock()
        self._write_count = 0
        if transport == "tcp":
            self._server = TCPServer(self._handle, host=host, port=port)
            self.address = self._server.address
        elif transport == "threading":
            self._server = ThreadingTransport(self._handle)
            self.address = None
        else:
            raise ValueError(f"unknown transport {transport!r}")

    # -- request handling ---------------------------------------------------
    def _handle(self, msg) -> Any:
        op = msg[0]
        with self._lock:
            if op == "extend":
                idx = self.rb.extend(msg[1])
                self._write_count += int(np.size(np.asarray(idx)))
                return np.asarray(idx)
            if op == "add":
                idx = self.rb.add(msg[1])
                self._write_count += 1
                return np.asarray(idx)
            if op == "sample":
                batch, info = self.rb.sample(msg[1], return_info=True)
                return (_to_numpy(batch), _to_numpy(info)
                        if isinstance(info, TDict) else info)
            if op == "update_priority":
                self.rb.update_priority(msg[1], msg[2])
                return True
            if op == "len":
                return len(self.rb)
            if op == "stats":
                return {"write_count": self._write_count,
                        "size": len(self.rb)}
            raise ValueError(f"unknown op {op!r}")

    def local_client(self) -> "DistributedReplayClient":
        if isinstance(self._server, ThreadingTransport):
            return DistributedReplayClient(transport=self._server)
        host, port = self.address
        return DistributedReplayClient(host=host, port=port)

    def close(self):
        self._server.close()


class DistributedReplayClient:
    """Remote view of a :class:`ReplayService` (reference
    ``_DistributedReplayClient`` :32): same surface as a local buffer."""

    def __init__(self, *, host: str | None = None, port: int | None = None,
                 transport: RequestReplyTransport | None = None,
                 timeout: float = 60.0):
        if transport is None:
            if host is None or port is None:
                raise ValueError("pass transport= or host=/port=")
            transport = TCPTransport(host, port, timeout=timeout)
        self._t = transport

    def extend(self, data: TDict):
        return self._t.request(("extend", _to_numpy(data)))

    def add(self, item: TDict):
        return self._t.request(("add", _to_numpy(item)))

    def sample(self, batch_size: int | None = None, return_info: bool = False):
        batch, info = self._t.request(("sample", batch_size))
        return (batch, info) if return_info else batch

    def update_priority(self, idx, priority):
        return self._t.request(
            ("update_priority", np.asarray(idx), np.asarray(priority)))

    def stats(self) -> dict:
        return self._t.request(("stats",))

    @property
    def write_count(self) -> int:
        return self.stats()["write_count"]

    def __len__(self) -> int:
        return self._t.request(("len",))

    def close(self):
        self._t.close()
