"""ctypes binding for the native section-routing builder.

See native/edge_plan.cpp.  Falls back to None when no compiler is
available; plan.py then uses the pure-python routing in route.py.
"""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

log = logging.getLogger(__name__)

_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from graph_tpu.native.build import build_library

        path = build_library("edge_plan.cpp")
        lib = ctypes.CDLL(path)
        lib.gt_build_sections.restype = ctypes.c_int
        lib.gt_build_sections.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - env without g++
        log.warning("native edge_plan unavailable (%s); using python routing", exc)
        _lib_failed = True
    return _lib


def build_sections_native(keys: np.ndarray, nthreads: int = 0):
    """Route all sections at once. keys: (nsec*65536,) int32.

    Returns (wa, wb, sstart, wa2, wb2) or None if the native library is
    unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, np.int32)
    nsec = keys.size // 65536
    wa = np.empty(keys.size, np.uint16)
    wb = np.empty(keys.size, np.uint16)
    sstart = np.empty(keys.size, np.uint16)
    wa2 = np.empty(keys.size, np.uint16)
    wb2 = np.empty(keys.size, np.uint16)
    if nthreads <= 0:
        nthreads = min(32, os.cpu_count() or 1)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    rc = lib.gt_build_sections(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(nsec),
        wa.ctypes.data_as(u16p), wb.ctypes.data_as(u16p),
        sstart.ctypes.data_as(u16p),
        wa2.ctypes.data_as(u16p), wb2.ctypes.data_as(u16p),
        ctypes.c_int(nthreads),
    )
    if rc != 0:  # pragma: no cover
        return None
    return wa, wb, sstart, wa2, wb2


class _GtLayout(ctypes.Structure):
    _fields_ = [
        ("nslots", ctypes.c_int64),
        ("nmid", ctypes.c_int64),
        ("win", ctypes.c_int64),
        ("nslices", ctypes.c_int64),
        ("widx", ctypes.POINTER(ctypes.c_uint16)),
        ("keys", ctypes.POINTER(ctypes.c_int32)),
        ("wvals", ctypes.POINTER(ctypes.c_float)),
        ("ws", ctypes.POINTER(ctypes.c_int32)),
        ("sb", ctypes.POINTER(ctypes.c_int32)),
        ("sec_mid", ctypes.POINTER(ctypes.c_int32)),
    ]


_layout_lib = None
_layout_failed = False


def _load_layout():
    global _layout_lib, _layout_failed
    if _layout_lib is not None or _layout_failed:
        return _layout_lib
    try:
        from graph_tpu.native.build import build_library

        lib = ctypes.CDLL(build_library("edge_layout.cpp"))
        lib.gt_build_layout.restype = ctypes.POINTER(_GtLayout)
        lib.gt_build_layout.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.gt_layout_free.argtypes = [ctypes.POINTER(_GtLayout)]
        _layout_lib = lib
    except Exception as exc:  # pragma: no cover
        log.warning("native edge_layout unavailable (%s); python layout", exc)
        _layout_failed = True
    return _layout_lib


_lanemap_lib = None
_lanemap_failed = False


def _load_lanemap():
    global _lanemap_lib, _lanemap_failed
    if _lanemap_lib is not None or _lanemap_failed:
        return _lanemap_lib
    try:
        from graph_tpu.native.build import build_library

        lib = ctypes.CDLL(build_library("lanemap.cpp"))
        lib.gt_lanemap_pack.restype = ctypes.c_int
        lib.gt_lanemap_pack.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _lanemap_lib = lib
    except Exception as exc:  # pragma: no cover - env without g++
        log.warning("native lanemap unavailable (%s); python repack", exc)
        _lanemap_failed = True
    return _lanemap_lib


def lanemap_pack_native(widx: np.ndarray, keys: np.ndarray,
                        wvals, win: int, nthreads: int = 0):
    """In-place lanemap tile repack (native/lanemap.cpp).

    Mirrors graph_tpu.engine.lanemap.lanemap_pack bit for bit; mutates
    widx/keys/wvals for the blocks that fit and returns the per-block
    bool mask, or None when the native library is unavailable (caller
    falls back to the python pass).
    """
    lib = _load_lanemap()
    if lib is None:
        return None
    assert widx.dtype == np.uint16 and widx.flags.c_contiguous
    assert keys.dtype == np.int32 and keys.flags.c_contiguous
    vptr = None
    if wvals is not None:
        assert wvals.dtype == np.float32 and wvals.flags.c_contiguous
        vptr = wvals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    nblocks = widx.size // 16384
    lm = np.zeros(nblocks, np.uint8)
    if nthreads <= 0:
        nthreads = min(32, os.cpu_count() or 1)
    rc = lib.gt_lanemap_pack(
        widx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vptr, ctypes.c_int64(widx.size), ctypes.c_int64(win),
        lm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(nthreads))
    if rc != 0:  # pragma: no cover
        return None
    return lm.astype(bool)


def lanemap2_pack_native(widx: np.ndarray, keys: np.ndarray,
                         wvals, win: int, skip: np.ndarray,
                         nthreads: int = 0):
    """In-place two-table lanemap repack (native/lanemap.cpp, round 4).

    Mirrors graph_tpu.engine.lanemap.lanemap2_pack bit for bit; returns
    (lm2 mask, wt2 flat) or None when the native library is unavailable
    (caller falls back to the python pass).
    """
    lib = _load_lanemap()
    if lib is None:
        return None
    try:
        fn = lib.gt_lanemap2_pack
    except AttributeError:  # older .so without the symbol
        return None
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    assert widx.dtype == np.uint16 and widx.flags.c_contiguous
    assert keys.dtype == np.int32 and keys.flags.c_contiguous
    vptr = None
    if wvals is not None:
        assert wvals.dtype == np.float32 and wvals.flags.c_contiguous
        vptr = wvals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    nblocks = widx.size // 16384
    lm2 = np.zeros(nblocks, np.uint8)
    wt2 = np.zeros(widx.size, np.uint8)
    skip8 = np.ascontiguousarray(skip.astype(np.uint8))
    if nthreads <= 0:
        nthreads = min(32, os.cpu_count() or 1)
    rc = fn(
        widx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vptr, ctypes.c_int64(widx.size), ctypes.c_int64(win),
        skip8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lm2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        wt2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(nthreads))
    if rc != 0:  # pragma: no cover
        return None
    return lm2.astype(bool), (wt2 if lm2.any() else None)


_pair_lib = None
_pair_failed = False


def _load_pair():
    global _pair_lib, _pair_failed
    if _pair_lib is not None or _pair_failed:
        return _pair_lib
    try:
        from graph_tpu.native.build import build_library

        lib = ctypes.CDLL(build_library("pair_place.cpp"))
        u16pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16))
        i32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))
        lib.gt_pair_place.restype = ctypes.c_int64
        lib.gt_pair_place.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            u16pp, u16pp, i32pp,
        ]
        lib.gt_pair_free.argtypes = [
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _pair_lib = lib
    except Exception as exc:  # pragma: no cover - env without g++
        log.warning("native pair_place unavailable (%s); python placement",
                    exc)
        _pair_failed = True
    return _pair_lib


def pair_place_native(s1, s2, dstl, tile_pool: int = 16):
    """Greedy hub-pair placement for one mid (native/pair_place.cpp).

    Mirrors graph_tpu.engine.pair.place_mid_pairs bit for bit.  Returns
    (widx (ntiles*8, 128) uint16, widx2, keys (ntiles*1024,) int32) or
    None when the native library is unavailable.
    """
    lib = _load_pair()
    if lib is None:
        return None
    s1 = np.ascontiguousarray(s1, np.int32)
    s2 = np.ascontiguousarray(s2, np.int32)
    dstl = np.ascontiguousarray(dstl, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    w1 = ctypes.POINTER(ctypes.c_uint16)()
    w2 = ctypes.POINTER(ctypes.c_uint16)()
    kp = ctypes.POINTER(ctypes.c_int32)()
    ntiles = lib.gt_pair_place(
        s1.ctypes.data_as(i32p), s2.ctypes.data_as(i32p),
        dstl.ctypes.data_as(i32p), ctypes.c_int64(s1.size),
        ctypes.c_int32(tile_pool),
        ctypes.byref(w1), ctypes.byref(w2), ctypes.byref(kp))
    if ntiles < 0:  # pragma: no cover
        return None
    n = int(ntiles)
    widx = np.ctypeslib.as_array(w1, (n * 8, 128)).copy()
    widx2 = np.ctypeslib.as_array(w2, (n * 8, 128)).copy()
    keys = np.ctypeslib.as_array(kp, (n * 1024,)).copy()
    lib.gt_pair_free(w1, w2, kp)
    return widx, widx2, keys


_quad_lib = None
_quad_failed = False


def _load_quad():
    global _quad_lib, _quad_failed
    if _quad_lib is not None or _quad_failed:
        return _quad_lib
    try:
        from graph_tpu.native.build import build_library

        lib = ctypes.CDLL(build_library("quad_place.cpp"))
        i32p = ctypes.POINTER(ctypes.c_int32)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.gt_quad_place.restype = ctypes.c_int64
        lib.gt_quad_place.argtypes = [
            i32p, i32p, i32p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(u16p), ctypes.POINTER(i32p),
        ]
        lib.gt_quad_free.argtypes = [ctypes.POINTER(u16p), i32p]
        _quad_lib = lib
    except Exception as exc:  # pragma: no cover - env without g++
        log.warning("native quad_place unavailable (%s); python placement",
                    exc)
        _quad_failed = True
    return _quad_lib


def quad_place_native(q, dstl, tile_pool: int = 16, nperm: int = 4):
    """Greedy hub-quad placement for one mid (native/quad_place.cpp).

    Mirrors graph_tpu.engine.pair.place_mid_quads bit for bit.  Returns
    (w1, w2, w3, w4, keys) or None when unavailable."""
    lib = _load_quad()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int32)
    dstl = np.ascontiguousarray(dstl, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    w_out = (u16p * 4)()
    kp = ctypes.POINTER(ctypes.c_int32)()
    ntiles = lib.gt_quad_place(
        q[0].ctypes.data_as(i32p), q[1].ctypes.data_as(i32p),
        q[2].ctypes.data_as(i32p), q[3].ctypes.data_as(i32p),
        dstl.ctypes.data_as(i32p), ctypes.c_int64(q.shape[1]),
        ctypes.c_int32(tile_pool), ctypes.c_int32(nperm),
        ctypes.cast(w_out, ctypes.POINTER(u16p)), ctypes.byref(kp))
    if ntiles < 0:  # pragma: no cover
        return None
    n = int(ntiles)
    ws = [np.ctypeslib.as_array(w_out[k], (n * 8, 128)).copy()
          for k in range(4)]
    keys = np.ctypeslib.as_array(kp, (n * 1024,)).copy()
    lib.gt_quad_free(ctypes.cast(w_out, ctypes.POINTER(u16p)), kp)
    return ws[0], ws[1], ws[2], ws[3], keys


def build_layout_native(src, dst, values=None, n=0, win: int = 0,
                        nslices: int = 0, n_src: int = 0, nthreads: int = 0):
    """Sort + slot-stream layout in C++ (win=0 auto-selects the K1
    gather window; n_src=0 means the gather domain equals ``n``).
    Returns dict of arrays or None."""
    lib = _load_layout()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    vptr = None
    if values is not None:
        values = np.ascontiguousarray(values, np.float32)
        vptr = values.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if nthreads <= 0:
        nthreads = min(32, os.cpu_count() or 1)
    Lp = lib.gt_build_layout(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vptr, ctypes.c_int64(src.size), ctypes.c_int64(n),
        ctypes.c_int64(win), ctypes.c_int64(nslices),
        ctypes.c_int64(n_src), ctypes.c_int(nthreads))
    L = Lp.contents
    ns = L.nslots
    out = {
        "nslots": int(ns),
        "nmid": int(L.nmid),
        "win": int(L.win),
        "nslices": int(L.nslices),
        "widx": np.ctypeslib.as_array(L.widx, (ns,)).copy(),
        "keys": np.ctypeslib.as_array(L.keys, (ns,)).copy(),
        "ws": np.ctypeslib.as_array(L.ws, (ns // 1024,)).copy(),
        "sb": np.ctypeslib.as_array(L.sb, (ns // 16384,)).copy(),
        "sec_mid": np.ctypeslib.as_array(L.sec_mid, (ns // 65536,)).copy(),
        "wvals": (np.ctypeslib.as_array(L.wvals, (ns,)).copy()
                  if values is not None else None),
    }
    lib.gt_layout_free(Lp)
    return out
