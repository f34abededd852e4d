"""Mailbox: many-client request/reply over multiprocessing queues.

Counterpart of the reference ``Mailbox`` stack
(``/root/reference/torchrl/_comm/mailbox.py``: ``Mailbox`` :185,
``MailboxClient`` :70, ``MailboxFuture`` :43, ``watch_process_liveness``
:26, ``MailboxPeerClosedError`` :22).

A service-side :class:`Mailbox` owns one shared request queue; each client
gets its own result queue.  Clients submit ``(client_id, request_id,
payload)`` and read futures; the service drains requests in batches and
resolves/rejects them by callback handle.  ``peer_alive`` events let clients
fail fast with :class:`MailboxPeerClosedError` when the service process dies
instead of blocking forever — wire them with :func:`watch_process_liveness`.
"""
from __future__ import annotations

import itertools
import multiprocessing as mp
import queue
import threading
import time
from typing import Any, Callable

__all__ = [
    "Mailbox", "MailboxClient", "MailboxFuture",
    "MailboxTransportError", "MailboxPeerClosedError",
    "watch_process_liveness",
]

_MISSING = object()
_PEER_CHECK_INTERVAL = 0.1


class MailboxTransportError(RuntimeError):
    """A mailbox transport failed independently of a timeout."""


class MailboxPeerClosedError(MailboxTransportError):
    """The mailbox peer exited before replying to a request."""


def watch_process_liveness(process_sentinel, alive_event) -> None:
    """Clear ``alive_event`` when the process behind ``process_sentinel``
    exits (reference mailbox.py:26).  Run in a daemon thread on the owner
    side of a process-backed service."""
    from multiprocessing.connection import wait as _wait

    try:
        _wait([process_sentinel])
    finally:
        try:
            alive_event.clear()
        except Exception:
            pass


class MailboxFuture:
    """Future-like handle for one mailbox request (reference :43)."""

    def __init__(self, client: "MailboxClient", request_id: int):
        self._client = client
        self._request_id = request_id
        self._result: Any = _MISSING

    def done(self) -> bool:
        if self._result is not _MISSING:
            return True
        try:
            self._result = self._client._get_result(self._request_id,
                                                    timeout=0)
        except queue.Empty:
            return False
        return True

    def result(self, timeout: float | None = None) -> Any:
        if self._result is _MISSING:
            self._result = self._client._get_result(self._request_id,
                                                    timeout=timeout)
        if isinstance(self._result, BaseException):
            raise self._result
        return self._result


class MailboxClient:
    """Client endpoint: ``submit`` returns a future; ``__call__`` blocks
    (reference :70).  Picklable — send it to a worker process."""

    def __init__(self, request_queue, result_queue, client_id: int,
                 peer_alive=None):
        self._requests = request_queue
        self._results = result_queue
        self._client_id = client_id
        self._peer_alive = peer_alive
        self._counter = itertools.count()
        self._pending: dict[int, Any] = {}
        self._lock = threading.Lock()

    @property
    def client_id(self) -> int:
        return self._client_id

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_lock"] = None
        d["_counter"] = None
        return d

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()
        self._counter = itertools.count()

    def _peer_dead(self) -> bool:
        return self._peer_alive is not None and not self._peer_alive.is_set()

    def submit(self, payload: Any) -> MailboxFuture:
        if self._peer_dead():
            raise MailboxPeerClosedError("mailbox peer is not alive")
        request_id = next(self._counter)
        self._requests.put((self._client_id, request_id, payload))
        return MailboxFuture(self, request_id)

    def __call__(self, payload: Any, timeout: float | None = None) -> Any:
        return self.submit(payload).result(timeout=timeout)

    def _get_result(self, request_id: int,
                    timeout: float | None = None) -> Any:
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._lock:
            while True:
                if request_id in self._pending:
                    return self._pending.pop(request_id)
                if deadline is not None and time.monotonic() > deadline:
                    raise queue.Empty
                if self._peer_dead():
                    raise MailboxPeerClosedError(
                        "mailbox peer exited before replying")
                wait = _PEER_CHECK_INTERVAL
                if deadline is not None:
                    wait = max(0.0, min(wait, deadline - time.monotonic()))
                try:
                    rid, value = self._results.get(
                        timeout=wait if timeout is not None else
                        _PEER_CHECK_INTERVAL)
                except queue.Empty:
                    if timeout is not None and time.monotonic() > (
                            deadline or 0):
                        raise
                    continue
                self._pending[rid] = value


class Mailbox:
    """Service endpoint (reference :185).

    ``client()`` mints a new client; ``drain(max_items)`` pulls pending
    requests as ``(callback, payload)`` pairs; ``resolve``/``reject`` send
    results back.  ``serve_forever(handler)`` is the convenience loop.
    """

    def __init__(self, *, ctx=None):
        self._ctx = ctx or mp.get_context("spawn")
        self._requests = self._ctx.Queue()
        self._result_queues: dict[int, Any] = {}
        self._next_client = itertools.count()
        self.alive = self._ctx.Event()
        self.alive.set()

    def client(self) -> MailboxClient:
        cid = next(self._next_client)
        rq = self._ctx.Queue()
        self._result_queues[cid] = rq
        return MailboxClient(self._requests, rq, cid, peer_alive=self.alive)

    def wait_for_work(self, timeout: float) -> None:
        """Block until at least one request is pending (or timeout)."""
        deadline = time.monotonic() + timeout
        while self._requests.empty() and time.monotonic() < deadline:
            time.sleep(0.005)

    def drain(self, max_items: int | None = None):
        """Pop up to ``max_items`` pending requests as
        ``[(callback, payload), ...]`` (reference drain :242)."""
        out = []
        while max_items is None or len(out) < max_items:
            try:
                cid, rid, payload = self._requests.get_nowait()
            except queue.Empty:
                break
            out.append(((cid, rid), payload))
        return out

    def resolve(self, callback, result: Any) -> bool:
        cid, rid = callback
        rq = self._result_queues.get(cid)
        if rq is None:
            return False
        rq.put((rid, result))
        return True

    def reject(self, callback, error: BaseException) -> bool:
        return self.resolve(callback, error)

    def serve_once(self, handler: Callable[[Any], Any],
                   timeout: float = 0.1) -> int:
        """Drain and handle pending requests once; returns count handled."""
        self.wait_for_work(timeout)
        items = self.drain()
        for cb, payload in items:
            try:
                self.resolve(cb, handler(payload))
            except BaseException as e:  # noqa: BLE001 - forwarded to client
                self.reject(cb, e)
        return len(items)

    def close(self):
        self.alive.clear()
