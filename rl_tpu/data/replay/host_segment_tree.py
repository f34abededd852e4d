"""ctypes bindings for the native host segment trees.

Mirrors the reference pybind exports (``torchrl._torchrl``
``SumSegmentTreeFp32/Fp64``, ``MinSegmentTreeFp32/Fp64`` — csrc/pybind.cpp
:21-38): same semantics (batched update, range query, inverse-CDF
``scan_lower_bound``).  The shared library is compiled on first use with
g++ (pybind11 is not available in this image; the C ABI + ctypes replaces
it).  Degrades with a clear error if no compiler is present — the device
(XLA) sampler path never needs this.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "SumSegmentTreeFp32",
    "SumSegmentTreeFp64",
    "MinSegmentTreeFp32",
    "MinSegmentTreeFp64",
]

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "segment_tree.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "_segment_tree.so")


def _load_lib() -> ctypes.CDLL:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        for prefix, scalar in (
            ("sum_f32", ctypes.c_float),
            ("min_f32", ctypes.c_float),
            ("sum_f64", ctypes.c_double),
            ("min_f64", ctypes.c_double),
        ):
            getattr(lib, f"{prefix}_create").restype = ctypes.c_void_p
            getattr(lib, f"{prefix}_create").argtypes = [ctypes.c_int64]
            getattr(lib, f"{prefix}_destroy").argtypes = [ctypes.c_void_p]
            getattr(lib, f"{prefix}_update").argtypes = [
                ctypes.c_void_p, ctypes.c_int64, scalar]
            getattr(lib, f"{prefix}_batch_update").argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(scalar), ctypes.c_int64]
            getattr(lib, f"{prefix}_get").restype = scalar
            getattr(lib, f"{prefix}_get").argtypes = [ctypes.c_void_p, ctypes.c_int64]
            getattr(lib, f"{prefix}_query").restype = scalar
            getattr(lib, f"{prefix}_query").argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
            getattr(lib, f"{prefix}_total").restype = scalar
            getattr(lib, f"{prefix}_total").argtypes = [ctypes.c_void_p]
        for prefix, scalar in (("sum_f32", ctypes.c_float), ("sum_f64", ctypes.c_double)):
            fn = getattr(lib, f"{prefix}_scan_lower_bound")
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p, scalar]
            bfn = getattr(lib, f"{prefix}_batch_scan_lower_bound")
            bfn.argtypes = [ctypes.c_void_p, ctypes.POINTER(scalar),
                            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
        return lib


class _SegmentTreeBase:
    _prefix: str
    _np_dtype: type
    _ctype: type

    def __init__(self, size: int):
        self._lib = _load_lib()
        self.size = int(size)
        self._handle = ctypes.c_void_p(
            getattr(self._lib, f"{self._prefix}_create")(self.size)
        )

    def __del__(self):
        if getattr(self, "_handle", None):
            getattr(self._lib, f"{self._prefix}_destroy")(self._handle)
            self._handle = None

    def __len__(self) -> int:
        return self.size

    def __setitem__(self, index, value):
        if np.isscalar(index) and np.isscalar(value):
            getattr(self._lib, f"{self._prefix}_update")(
                self._handle, int(index), self._ctype(value)
            )
            return
        idx = np.ascontiguousarray(np.atleast_1d(index), np.int64)
        vals = np.ascontiguousarray(
            np.broadcast_to(np.asarray(value, self._np_dtype), idx.shape)
        )
        getattr(self._lib, f"{self._prefix}_batch_update")(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            vals.ctypes.data_as(ctypes.POINTER(self._ctype)),
            len(idx),
        )

    update = __setitem__

    def __getitem__(self, index):
        if np.isscalar(index):
            return getattr(self._lib, f"{self._prefix}_get")(self._handle, int(index))
        idx = np.atleast_1d(index)
        return np.array(
            [getattr(self._lib, f"{self._prefix}_get")(self._handle, int(i)) for i in idx],
            self._np_dtype,
        )

    def query(self, start: int = 0, end: int | None = None):
        """Reduce over [start, end)."""
        end = self.size if end is None else end
        return getattr(self._lib, f"{self._prefix}_query")(
            self._handle, int(start), int(end)
        )

    def total(self):
        return getattr(self._lib, f"{self._prefix}_total")(self._handle)


class _SumTreeMixin:
    def scan_lower_bound(self, value):
        """Inverse-CDF index lookup (reference ScanLowerBound,
        csrc/segment_tree.h:289)."""
        if np.isscalar(value):
            return getattr(self._lib, f"{self._prefix}_scan_lower_bound")(
                self._handle, self._ctype(value)
            )
        vals = np.ascontiguousarray(np.atleast_1d(value), self._np_dtype)
        out = np.empty(len(vals), np.int64)
        getattr(self._lib, f"{self._prefix}_batch_scan_lower_bound")(
            self._handle,
            vals.ctypes.data_as(ctypes.POINTER(self._ctype)),
            len(vals),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out


class SumSegmentTreeFp32(_SumTreeMixin, _SegmentTreeBase):
    _prefix = "sum_f32"
    _np_dtype = np.float32
    _ctype = ctypes.c_float


class SumSegmentTreeFp64(_SumTreeMixin, _SegmentTreeBase):
    _prefix = "sum_f64"
    _np_dtype = np.float64
    _ctype = ctypes.c_double


class MinSegmentTreeFp32(_SegmentTreeBase):
    _prefix = "min_f32"
    _np_dtype = np.float32
    _ctype = ctypes.c_float


class MinSegmentTreeFp64(_SegmentTreeBase):
    _prefix = "min_f64"
    _np_dtype = np.float64
    _ctype = ctypes.c_double
