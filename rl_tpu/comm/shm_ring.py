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

__all__ = ["ShmRing", "SeqlockBox", "encode_array", "decode_array"]

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
        lib.ring_slot_size.restype = ctypes.c_uint64
        lib.ring_slot_size.argtypes = [ctypes.c_void_p]
        lib.ring_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.box_create.restype = ctypes.c_void_p
        lib.box_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.box_attach.restype = ctypes.c_void_p
        lib.box_attach.argtypes = [ctypes.c_char_p]
        lib.box_write.restype = ctypes.c_int
        lib.box_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_uint64]
        lib.box_read.restype = ctypes.c_int64
        lib.box_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_uint64,
                                 ctypes.POINTER(ctypes.c_uint64)]
        lib.box_size.restype = ctypes.c_uint64
        lib.box_size.argtypes = [ctypes.c_void_p]
        lib.box_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return lib


_HDR = struct.Struct("<16sB")  # dtype str (padded), ndim; then ndim * u32


def encode_array(arr: np.ndarray) -> bytes:
    """Self-describing array frame: dtype/ndim header + dims + raw bytes."""
    arr = np.ascontiguousarray(arr)
    hdr = _HDR.pack(arr.dtype.str.encode().ljust(16, b"\0"), arr.ndim)
    dims = struct.pack(f"<{arr.ndim}I", *arr.shape)
    return hdr + dims + arr.tobytes()


def decode_array(raw: bytes) -> np.ndarray:
    dt_raw, ndim = _HDR.unpack_from(raw)
    dims = struct.unpack_from(f"<{ndim}I", raw, _HDR.size)
    off = _HDR.size + 4 * ndim
    dt = np.dtype(dt_raw.rstrip(b"\0").decode())
    return np.frombuffer(raw, dtype=dt, offset=off).reshape(dims).copy()


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
        return cls(h, name, int(lib.ring_slot_size(h)), owner=False)

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
                # bounded copy — .raw[:n] would memcpy the whole slot buffer
                return ctypes.string_at(self._buf, n)
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
        self.push_bytes(encode_array(arr), **kw)

    def pop_array(self, **kw) -> np.ndarray:
        return decode_array(self.pop_bytes(**kw))


class SeqlockBox:
    """Single-slot versioned latest-value store (seqlock) over shared memory.

    The reference ``SharedMemWeightSyncScheme``'s primitive
    (``/root/reference/torchrl/weight_update/_shared.py:327``): ONE writer
    overwrites in place, ANY number of readers copy-and-verify.  The writer
    never blocks on slow readers — the right shape for weight broadcast,
    where only the newest version matters.  ``read()`` returns
    ``(payload, version)``; version is the write count, so callers can skip
    payloads they have already seen.
    """

    def __init__(self, handle, name: str, size: int, owner: bool):
        self._h = handle
        self.name = name
        self.size = size
        self._owner = owner
        self._buf = ctypes.create_string_buffer(size)

    @classmethod
    def create(cls, name: str, size: int) -> "SeqlockBox":
        lib = _load()
        nm = f"/rltpu_box_{name}".encode()
        h = lib.box_create(nm, size)
        if not h:
            raise OSError(f"shm box create failed for {name!r}")
        return cls(h, name, size, owner=True)

    @classmethod
    def attach(cls, name: str, *, timeout: float = 10.0) -> "SeqlockBox":
        lib = _load()
        nm = f"/rltpu_box_{name}".encode()
        deadline = time.monotonic() + timeout
        while True:
            h = lib.box_attach(nm)
            if h:
                break
            if time.monotonic() > deadline:
                raise OSError(f"shm box {name!r} not found")
            time.sleep(0.01)
        return cls(h, name, int(lib.box_size(h)), owner=False)

    def close(self) -> None:
        if self._h:
            _load().box_close(self._h, 1 if self._owner else 0)
            self._h = None

    # -- raw bytes ---------------------------------------------------------
    def write_bytes(self, payload: bytes) -> None:
        rc = _load().box_write(self._h, payload, len(payload))
        if rc == -2:
            raise ValueError(f"payload {len(payload)}B exceeds box size")

    def read_bytes(self) -> tuple[bytes | None, int]:
        """(payload, version); (None, 0) when nothing was ever written."""
        ver = ctypes.c_uint64(0)
        n = _load().box_read(self._h, self._buf, len(self._buf),
                             ctypes.byref(ver))
        if n == -2:
            raise ValueError("read buffer smaller than payload")
        if n == -3:
            raise TimeoutError(
                "seqlock box stuck mid-write (writer died during box_write?)")
        if n == 0 and ver.value == 0:
            return None, 0
        return ctypes.string_at(self._buf, n), int(ver.value)

    # -- framed numpy arrays ------------------------------------------------
    def write_array(self, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        hdr = _HDR.pack(arr.dtype.str.encode().ljust(16, b"\0"), arr.ndim)
        dims = struct.pack(f"<{arr.ndim}I", *arr.shape)
        self.write_bytes(hdr + dims + arr.tobytes())

    def read_array(self) -> tuple[np.ndarray | None, int]:
        raw, ver = self.read_bytes()
        if raw is None:
            return None, 0
        dt_raw, ndim = _HDR.unpack_from(raw)
        dims = struct.unpack_from(f"<{ndim}I", raw, _HDR.size)
        off = _HDR.size + 4 * ndim
        dt = np.dtype(dt_raw.rstrip(b"\0").decode())
        return np.frombuffer(raw, dtype=dt, offset=off).reshape(dims).copy(), ver
