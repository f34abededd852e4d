"""Shared-memory SPSC ring transport (ctypes over ``csrc/shm_ring.cpp``).

Native counterpart of the reference's shared-memory TensorDict transport
between env/collector workers (reference batched_envs.py §3.3 /
weight_update/_shared.py): fixed-size slots carry raw array bytes between
exactly one producer and one consumer process without pickling or pipe
syscalls on the payload path.  Control stays on pipes; bulk data rides the
ring.

    ring = ShmRing.create("obs", slot_size=1 << 20, n_slots=8)   # parent
    ring2 = ShmRing.attach("obs")                                # child
    ring2.push_array(np.zeros((64, 84, 84), np.uint8))
    arr = ring.pop_array()        # -> dtype/shape restored

``push_array``/``pop_array`` frame the payload with a tiny header encoding
dtype + shape, so the reader needs no out-of-band schema.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
import time

import numpy as np

__all__ = ["ShmRing"]

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "shm_ring.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "csrc", "_shm_ring.so")


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src, so = os.path.abspath(_SRC), os.path.abspath(_SO)
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", so, "-lrt"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_uint64]
        lib.ring_attach.restype = ctypes.c_void_p
        lib.ring_attach.argtypes = [ctypes.c_char_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_uint64]
        lib.ring_pop.restype = ctypes.c_int64
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_uint64]
        lib.ring_size.restype = ctypes.c_uint64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return lib


_HDR = struct.Struct("<16sB")  # dtype str (padded), ndim; then ndim * u32


class ShmRing:
    """One direction of a single-producer single-consumer shm channel."""

    def __init__(self, handle, name: str, slot_size: int, owner: bool):
        self._h = handle
        self.name = name
        self.slot_size = slot_size
        self._owner = owner
        self._buf = ctypes.create_string_buffer(slot_size)

    # -- lifecycle ---------------------------------------------------------
    @classmethod
    def create(cls, name: str, *, slot_size: int = 1 << 20,
               n_slots: int = 16) -> "ShmRing":
        lib = _load()
        nm = f"/rltpu_{name}".encode()
        h = lib.ring_create(nm, slot_size, n_slots)
        if not h:
            raise OSError(f"shm ring create failed for {name!r}")
        return cls(h, name, slot_size, owner=True)

    @classmethod
    def attach(cls, name: str, *, timeout: float = 10.0) -> "ShmRing":
        lib = _load()
        nm = f"/rltpu_{name}".encode()
        deadline = time.monotonic() + timeout
        while True:
            h = lib.ring_attach(nm)
            if h:
                break
            if time.monotonic() > deadline:
                raise OSError(f"shm ring {name!r} not found")
            time.sleep(0.01)
        # slot size read back through a probe pop buffer of max size is not
        # available via the ABI; keep the creator's default unless given.
        return cls(h, name, 1 << 24, owner=False)

    def close(self) -> None:
        if self._h:
            _load().ring_close(self._h, 1 if self._owner else 0)
            self._h = None

    # -- raw bytes ---------------------------------------------------------
    def push_bytes(self, payload: bytes, *, timeout: float | None = 5.0) -> None:
        lib = _load()
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            rc = lib.ring_push(self._h, payload, len(payload))
            if rc == 0:
                return
            if rc == -2:
                raise ValueError(f"payload {len(payload)}B exceeds slot size")
            if deadline is not None and time.monotonic() > deadline:
                raise TimeoutError("shm ring full")
            time.sleep(0.0005)

    def pop_bytes(self, *, timeout: float | None = 5.0) -> bytes:
        lib = _load()
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            n = lib.ring_pop(self._h, self._buf, len(self._buf))
            if n >= 0:
                return self._buf.raw[:n]
            if n == -2:
                self._buf = ctypes.create_string_buffer(len(self._buf) * 2)
                continue
            if deadline is not None and time.monotonic() > deadline:
                raise TimeoutError("shm ring empty")
            time.sleep(0.0005)

    def __len__(self) -> int:
        return int(_load().ring_size(self._h))

    def stats(self) -> dict:
        return {"queued": len(self)}

    # -- framed numpy arrays ------------------------------------------------
    def push_array(self, arr: np.ndarray, **kw) -> None:
        arr = np.ascontiguousarray(arr)
        hdr = _HDR.pack(arr.dtype.str.encode().ljust(16, b"\0"), arr.ndim)
        dims = struct.pack(f"<{arr.ndim}I", *arr.shape)
        self.push_bytes(hdr + dims + arr.tobytes(), **kw)

    def pop_array(self, **kw) -> np.ndarray:
        raw = self.pop_bytes(**kw)
        dt_raw, ndim = _HDR.unpack_from(raw)
        dims = struct.unpack_from(f"<{ndim}I", raw, _HDR.size)
        off = _HDR.size + 4 * ndim
        dt = np.dtype(dt_raw.rstrip(b"\0").decode())
        return np.frombuffer(raw, dtype=dt, offset=off).reshape(dims).copy()
