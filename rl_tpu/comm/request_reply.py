"""Host control-plane transports.

Counterpart of the reference comm layer (``/root/reference/torchrl/_comm/``:
``RequestReplyTransport`` ABC request_reply.py:163, ``ChannelServer`` :224,
``TorchDistributedTransport`` distributed.py:505, rendezvous protocols).

On TPU the DATA plane is XLA collectives; this layer is only the control
plane: weight-version notifications, replay-service RPC, rendezvous.  Two
transports: in-process (queues, for threads driving host envs) and TCP
(length-prefixed pickle, for cross-host coordination without torch.rpc).
"""
from __future__ import annotations

import pickle
import queue
import socket
import struct
import threading
from typing import Any, Callable

__all__ = ["RequestReplyTransport", "ThreadingTransport", "TCPServer", "TCPTransport"]

_HDR = struct.Struct(">I")


class RequestReplyTransport:
    """ABC: blocking ``request(payload) -> reply``."""

    def request(self, payload: Any) -> Any:
        raise NotImplementedError

    def close(self) -> None:
        pass


class ThreadingTransport(RequestReplyTransport):
    """In-process transport: a server thread consumes requests from a queue
    (reference threading transport)."""

    def __init__(self, handler: Callable[[Any], Any]):
        self._handler = handler
        self._q: queue.Queue = queue.Queue()
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while self._running:
            try:
                payload, reply_box, done = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                reply_box.append(self._handler(payload))
            except Exception as e:  # surface handler errors to the caller
                reply_box.append(e)
            done.set()

    def request(self, payload: Any) -> Any:
        reply_box: list = []
        done = threading.Event()
        self._q.put((payload, reply_box, done))
        done.wait()
        out = reply_box[0]
        if isinstance(out, Exception):
            raise out
        return out

    def close(self):
        self._running = False
        self._thread.join(timeout=1.0)


def _send_msg(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj)
    sock.sendall(_HDR.pack(len(data)) + data)


def _recv_msg(sock: socket.socket) -> Any:
    hdr = b""
    while len(hdr) < _HDR.size:
        chunk = sock.recv(_HDR.size - len(hdr))
        if not chunk:
            raise ConnectionError("peer closed")
        hdr += chunk
    (n,) = _HDR.unpack(hdr)
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return pickle.loads(buf)


class TCPServer:
    """Length-prefixed pickle request-reply server (one thread per client).

    SECURITY: pickle over TCP — bind to trusted cluster networks only (same
    trust model as the reference's TCPStore/torch.rpc rendezvous).
    """

    def __init__(self, handler: Callable[[Any], Any], host: str = "127.0.0.1",
                 port: int = 0):
        self._handler = handler
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(32)
        self.address = self._sock.getsockname()
        self._running = True
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self):
        while self._running:
            try:
                self._sock.settimeout(0.2)
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=self._serve_conn, args=(conn,), daemon=True).start()

    def _serve_conn(self, conn: socket.socket):
        with conn:
            while self._running:
                try:
                    payload = _recv_msg(conn)
                except (ConnectionError, OSError):
                    return
                try:
                    reply = ("ok", self._handler(payload))
                except Exception as e:
                    reply = ("err", repr(e))
                try:
                    _send_msg(conn, reply)
                except OSError:
                    return

    def close(self):
        self._running = False
        try:
            self._sock.close()
        except OSError:
            pass


class TCPTransport(RequestReplyTransport):
    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._lock = threading.Lock()

    def request(self, payload: Any) -> Any:
        with self._lock:
            _send_msg(self._sock, payload)
            status, reply = _recv_msg(self._sock)
        if status == "err":
            raise RuntimeError(f"remote handler failed: {reply}")
        return reply

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass
