"""Rendezvous: publish/read/wait key-value coordination.

Counterpart of the reference rendezvous protocols
(``/root/reference/torchrl/_comm/rendezvous.py``: ``Rendezvous`` protocol
:17, ``MappingRendezvous`` :30, ``TCPStoreRendezvous`` :51).  The TCP store
here replaces torch.distributed's TCPStore with the framework's own
length-prefixed pickle server — the control plane stays dependency-free;
tensor traffic never goes through it (XLA collectives own the data plane).
"""
from __future__ import annotations

import time
from typing import Any, MutableMapping

from .request_reply import TCPServer, TCPTransport

__all__ = ["Rendezvous", "MappingRendezvous", "TCPStoreRendezvous",
           "TCPStoreServer"]

_MISSING = object()


class Rendezvous:
    """Protocol: ``publish(key, value)`` / ``read(key)`` / ``wait(key)``."""

    def publish(self, key: str, value: Any) -> None:
        raise NotImplementedError

    def read(self, key: str) -> Any:
        raise NotImplementedError

    def wait(self, key: str, timeout: float | None = None) -> Any:
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            try:
                return self.read(key)
            except KeyError:
                if deadline is not None and time.monotonic() > deadline:
                    raise TimeoutError(f"rendezvous key {key!r} not published")
                time.sleep(0.02)


class MappingRendezvous(Rendezvous):
    """Rendezvous over any mutable mapping (reference :30) — e.g. a plain
    dict for single-process tests or a mp.Manager().dict() across forks."""

    def __init__(self, mapping: MutableMapping[str, Any] | None = None):
        self._map = mapping if mapping is not None else {}

    def publish(self, key: str, value: Any) -> None:
        self._map[key] = value

    def read(self, key: str) -> Any:
        if key not in self._map:
            raise KeyError(key)
        return self._map[key]


class TCPStoreServer:
    """The store process: one TCPServer holding the key-value dict."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._store: dict[str, Any] = {}
        self._server = TCPServer(self._handle, host=host, port=port)
        self.address = self._server.address

    def _handle(self, msg):
        op = msg[0]
        if op == "set":
            _, k, v = msg
            self._store[k] = v
            return True
        if op == "get":
            _, k = msg
            if k not in self._store:
                return ("__missing__",)
            return ("__ok__", self._store[k])
        if op == "del":
            _, k = msg
            self._store.pop(k, None)
            return True
        raise ValueError(f"unknown op {op!r}")

    def close(self):
        self._server.close()


class TCPStoreRendezvous(Rendezvous):
    """Client view of a :class:`TCPStoreServer` (reference :51).

    One worker (rank 0 by convention) starts the server and shares
    ``(host, port)``; everyone — including rank 0 — connects as a client.
    """

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self._transport = TCPTransport(host, port, timeout=timeout)

    def publish(self, key: str, value: Any) -> None:
        self._transport.request(("set", key, value))

    def read(self, key: str) -> Any:
        out = self._transport.request(("get", key))
        if out[0] == "__missing__":
            raise KeyError(key)
        return out[1]

    def delete(self, key: str) -> None:
        self._transport.request(("del", key))

    def close(self):
        self._transport.close()
