"""ctypes bindings for the native host components (csrc/).

Loads ``csrc/libbvhbuild.so`` if present (``make -C csrc``), else falls back
to the pure-numpy builder transparently. The native builder is required to be
bit-identical to ``bvh.sah_build.build_sah`` (differentially tested), so
callers can treat the two as interchangeable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .bvh.flat import FlatBvh

_LIB = None
_TRIED = False
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_SRC_DIR, "libbvhbuild.so")
    if not os.path.exists(path):
        try:  # best-effort build; fine to fail (falls back to numpy)
            subprocess.run(
                ["make", "-C", _SRC_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.bvh_build_sah.restype = ctypes.c_int
    lib.bvh_build_sah.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    try:
        lib.bvh_collapse.restype = ctypes.c_int
        lib.bvh_collapse.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError:  # stale .so without the collapse entry point
        pass
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_sah_native(shape_min, shape_max, nthreads: int = 0):
    """Native multithreaded SAH build; same outputs as ``build_sah``.

    Raises RuntimeError if the native library is unavailable; 3D only.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native builder not available (make -C csrc failed?)")
    smin = np.ascontiguousarray(shape_min, np.float32)
    smax = np.ascontiguousarray(shape_max, np.float32)
    n, d = smin.shape
    if d != 3:
        raise ValueError("native builder is 3D-only")
    total = 2 * n - 1
    amin = np.empty((total, 3), np.float32)
    amax = np.empty((total, 3), np.float32)
    entry = np.empty(total, np.int32)
    exit_ = np.empty(total, np.int32)
    shape = np.empty(total, np.int32)
    parent = np.empty(total, np.int32)
    s2n = np.empty(n, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.bvh_build_sah(
        smin.ctypes.data_as(fp),
        smax.ctypes.data_as(fp),
        ctypes.c_int64(n),
        amin.ctypes.data_as(fp),
        amax.ctypes.data_as(fp),
        entry.ctypes.data_as(ip),
        exit_.ctypes.data_as(ip),
        shape.ctypes.data_as(ip),
        parent.ctypes.data_as(ip),
        s2n.ctypes.data_as(ip),
        ctypes.c_int32(nthreads),
    )
    if rc != 0:
        raise RuntimeError(f"native builder failed with code {rc}")
    return FlatBvh(amin, amax, entry, exit_, shape, parent), s2n


def collapse_native(nodes: np.ndarray, K: int) -> np.ndarray | None:
    """Native K-ary collapse of an [8, nn] entry/exit table; None if
    the library (or its collapse entry point) is unavailable. Identical
    output to ``ops.cluster.collapse_upper``'s Python path."""
    lib = _load()
    if lib is None or not hasattr(lib, "bvh_collapse") or lib.bvh_collapse.argtypes is None:
        return None
    tab = np.ascontiguousarray(nodes, np.float32)
    nn = tab.shape[1]
    out = np.empty_like(tab)
    out_nn = ctypes.c_int64(0)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.bvh_collapse(
        tab.ctypes.data_as(fp), ctypes.c_int64(nn), ctypes.c_int32(K),
        out.ctypes.data_as(fp), ctypes.byref(out_nn),
    )
    if rc != 0:
        return None
    return np.ascontiguousarray(out[:, : out_nn.value])


def build_sah_auto(shape_min, shape_max, config=None, nthreads: int = 0):
    """Native builder when available and applicable, numpy otherwise."""
    smin = np.asarray(shape_min)
    if smin.shape[0] > 0 and smin.shape[1] == 3 and native_available():
        return build_sah_native(shape_min, shape_max, nthreads)
    from .bvh.sah_build import build_sah
    from .config import DEFAULT_CONFIG

    return build_sah(shape_min, shape_max, config or DEFAULT_CONFIG)
