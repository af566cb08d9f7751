"""ctypes binding for the native multithreaded edge-list parser.

Reference analog: the mmap+threads parser in
crates/builder/src/input/edgelist.rs; see native/edgelist_parser.cpp.
"""

from __future__ import annotations

import ctypes
import logging
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_lib = None
_lib_failed = False


class _GtEdgeList(ctypes.Structure):
    _fields_ = [
        ("src", ctypes.POINTER(ctypes.c_int64)),
        ("dst", ctypes.POINTER(ctypes.c_int64)),
        ("val", ctypes.POINTER(ctypes.c_float)),
        ("count", ctypes.c_int64),
    ]


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from graph_tpu.native.build import build_library

        path = build_library("edgelist_parser.cpp")
        lib = ctypes.CDLL(path)
        lib.gt_parse_edge_list.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(_GtEdgeList),
        ]
        lib.gt_parse_edge_list.restype = ctypes.c_int
        lib.gt_free_edge_list.argtypes = [ctypes.POINTER(_GtEdgeList)]
        lib.gt_free_edge_list.restype = None
        _lib = lib
    except Exception as e:  # no compiler / build failure -> fallback
        log.debug("native edge-list parser unavailable: %s", e)
        _lib_failed = True
        _lib = None
    return _lib


def parse(
    path: str, weighted: bool
) -> Optional[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
    """Parse with the native library; None if unavailable (use fallback)."""
    lib = _load()
    if lib is None:
        return None
    res = _GtEdgeList()
    rc = lib.gt_parse_edge_list(str(path).encode(), int(weighted), ctypes.byref(res))
    if rc != 0:
        if rc == 1:
            raise FileNotFoundError(path)
        raise MemoryError(f"native edge-list parse failed with code {rc}")
    try:
        n = res.count
        if n == 0:
            empty = np.zeros(0, dtype=np.int64)
            return empty, empty.copy(), (np.zeros(0, np.float32) if weighted else None)
        src = np.ctypeslib.as_array(res.src, shape=(n,)).copy()
        dst = np.ctypeslib.as_array(res.dst, shape=(n,)).copy()
        val = (
            np.ctypeslib.as_array(res.val, shape=(n,)).copy() if weighted else None
        )
        return src, dst, val
    finally:
        lib.gt_free_edge_list(ctypes.byref(res))
