"""ctypes binding for the native host-CSR builder / TC orientation.

See native/host_csr.cpp.  Falls back to None when no compiler is
available; callers then use the numpy paths (same results).
"""

from __future__ import annotations

import ctypes
import logging

import numpy as np

log = logging.getLogger(__name__)

_lib = None
_failed = False


class _GtHostCsr(ctypes.Structure):
    _fields_ = [
        ("m_out", ctypes.c_int64),
        ("offsets", ctypes.POINTER(ctypes.c_int32)),
        ("rows", ctypes.POINTER(ctypes.c_int32)),
        ("cols", ctypes.POINTER(ctypes.c_int32)),
        ("vals", ctypes.POINTER(ctypes.c_float)),
    ]


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        from graph_tpu.native.build import build_library

        lib = ctypes.CDLL(build_library("host_csr.cpp"))
        lib.gt_build_undirected.restype = ctypes.POINTER(_GtHostCsr)
        lib.gt_build_undirected.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.gt_host_csr_free.argtypes = [ctypes.POINTER(_GtHostCsr)]
        lib.gt_tc_orient.restype = ctypes.c_int64
        lib.gt_tc_orient.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - env without g++
        log.warning("native host_csr unavailable (%s); numpy fallback", exc)
        _failed = True
    return _lib


def build_undirected_native(src, dst, values, n: int, layout_code: int):
    """Returns (offsets, rows, cols, vals) int32/float32 or None."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    vptr = None
    if values is not None:
        values = np.ascontiguousarray(values, np.float32)
        vptr = values.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    out_p = lib.gt_build_undirected(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vptr, ctypes.c_int64(src.size), ctypes.c_int64(n),
        ctypes.c_int(layout_code))
    out = out_p.contents
    k = int(out.m_out)
    offsets = np.ctypeslib.as_array(out.offsets, (n + 1,)).copy()
    rows = np.ctypeslib.as_array(out.rows, (k,)).copy() if k else \
        np.zeros(0, np.int32)
    cols = np.ctypeslib.as_array(out.cols, (k,)).copy() if k else \
        np.zeros(0, np.int32)
    vals = None
    if values is not None and k:
        vals = np.ctypeslib.as_array(out.vals, (k,)).copy()
    elif values is not None:
        vals = np.zeros(0, np.float32)
    lib.gt_host_csr_free(out_p)
    return offsets, rows, cols, vals


def tc_orient_native(srcs, tgts, n: int):
    """Degree-rank + forward filter + (a, b) radix sort; or None."""
    lib = _load()
    if lib is None:
        return None
    srcs = np.ascontiguousarray(srcs, np.int32)
    tgts = np.ascontiguousarray(tgts, np.int32)
    m = srcs.size
    a = np.empty(m, np.int32)
    b = np.empty(m, np.int32)
    mf = lib.gt_tc_orient(
        srcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tgts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(m), ctypes.c_int64(n),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return a[:mf].copy(), b[:mf].copy()
