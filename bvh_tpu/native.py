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

# Bump alongside csrc/sah_builder.cpp's bvh_native_version: _load() rebuilds
# a stale .so so new entry points (e.g. bvh_build_sah_hint) actually load
# instead of silently degrading to their fallbacks (advisor r4).
_EXPECTED_NATIVE_VERSION = 3


def _find_src_dir() -> str:
    """csrc/ location: env override, repo checkout, or installed package."""
    env = os.environ.get("BVH_TPU_NATIVE_DIR")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (os.path.join(os.path.dirname(here), "csrc"),
                 os.path.join(here, "csrc")):
        if os.path.isdir(cand):
            return cand
    return os.path.join(os.path.dirname(here), "csrc")


_SRC_DIR = _find_src_dir()


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_SRC_DIR, "libbvhbuild.so")

    def _make(force=False):
        if not os.path.isdir(_SRC_DIR):
            return False  # wheel install without sources: numpy fallback
        # force: `clean` first so gcc writes a NEW inode — dlopen caches by
        # (dev, inode), and truncating the mapped .so in place would hand the
        # reload the stale mapping (or SIGBUS the old one)
        cmd = ["make", "-C", _SRC_DIR] + (["clean", "all"] if force else [])
        try:  # best-effort build; fine to fail (falls back to numpy)
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False

    if not os.path.exists(path) and not _make():
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    # Stale-.so guard: an old checkout's .so predates newer entry points and
    # would silently lose them (cluster_hint => ~2x host build). Rebuild and
    # reload once; if the rebuild fails, keep the old lib (its fallbacks are
    # correct, just slower).
    try:
        ver = int(lib.bvh_native_version())
    except AttributeError:
        ver = 0
    if ver < _EXPECTED_NATIVE_VERSION:
        handle = lib._handle
        del lib
        try:
            import _ctypes

            _ctypes.dlclose(handle)
        except Exception:
            pass  # leaked handle at worst; the fresh inode still loads clean
        if not _make(force=True):
            try:  # rebuild failed: keep the stale lib (correct, just slower)
                lib = ctypes.CDLL(path)
            except OSError:
                return None
        else:
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
        lib.bvh_tri_aabbs.restype = ctypes.c_int
        fp_ = ctypes.POINTER(ctypes.c_float)
        ip_ = ctypes.POINTER(ctypes.c_int32)
        lib.bvh_tri_aabbs.argtypes = [fp_, fp_, fp_, ctypes.c_int64, fp_, fp_]
        lib.bvh_cut_tight.restype = ctypes.c_int64
        lib.bvh_cut_tight.argtypes = [ip_, ip_, ctypes.c_int64, ctypes.c_int32, ip_]
        lib.bvh_pack_tight.restype = ctypes.c_int
        lib.bvh_pack_tight.argtypes = [fp_, fp_, fp_, ip_, ip_, ip_, ip_,
                                       ctypes.c_int64, ctypes.c_int32, fp_,
                                       fp_, ip_]
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
    try:
        lib.bvh_build_sah_hint.restype = ctypes.c_int
        lib.bvh_build_sah_hint.argtypes = (
            lib.bvh_build_sah.argtypes + [ctypes.c_int32])
    except AttributeError:  # stale .so: hinted builds fall back to exact
        pass
    try:
        fp_ = ctypes.POINTER(ctypes.c_float)
        ip_ = ctypes.POINTER(ctypes.c_int32)
        lp_ = ctypes.POINTER(ctypes.c_int64)
        lib.bvh_build_sah_clusters.restype = ctypes.c_int64
        lib.bvh_build_sah_clusters.argtypes = [
            fp_, fp_, ctypes.c_int64, ctypes.c_int32, fp_, fp_, ip_, lp_]
        lib.bvh_pack_clusters.restype = ctypes.c_int
        lib.bvh_pack_clusters.argtypes = [
            fp_, fp_, fp_, ip_, lp_, ctypes.c_int64, ctypes.c_int32, fp_,
            fp_, ip_]
        lib.bvh_build_wide.restype = ctypes.c_int64
        lib.bvh_build_wide.argtypes = [
            fp_, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, fp_,
            ctypes.c_int64, ip_, ip_]
    except AttributeError:  # stale .so: cluster fast path unavailable
        pass
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_sah_native(shape_min, shape_max, nthreads: int = 0,
                     cluster_hint: int = 0):
    """Native multithreaded SAH build; same outputs as ``build_sah``.

    ``cluster_hint`` > 0 switches subtrees at or below that leaf count to
    median splits (same leaf SETS per subtree and exact bounds, so any
    <=hint cluster cut of the tree is unchanged; intra-subtree leaf order
    differs from the exact SAH tree). Only the tight-scene pipeline — which
    dissolves all structure below its cluster cut — should pass it; the
    default 0 is the bit-identical-to-numpy contract ``tests/test_native.py``
    checks. Ignored (exact build) when the loaded .so predates the entry.

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
    args = [
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
    ]
    if cluster_hint > 0 and hasattr(lib, "bvh_build_sah_hint") \
            and lib.bvh_build_sah_hint.argtypes is not None:
        rc = lib.bvh_build_sah_hint(*args, ctypes.c_int32(cluster_hint))
    else:
        rc = lib.bvh_build_sah(*args)
    if rc != 0:
        raise RuntimeError(f"native builder failed with code {rc}")
    return FlatBvh(amin, amax, entry, exit_, shape, parent), s2n


def build_sah_clusters_native(shape_min, shape_max, leaf_size: int):
    """Cluster-stopping SAH build (csrc fast path): returns
    ``(cl_min, cl_max, tri_order, cl_off)`` — per-cluster exact bounds
    [C, 3], the DFS-packed triangle ids [n], and segment offsets [C + 1] —
    or None when the library (or entry point) is unavailable.

    Bit-identical cluster sets/bounds/lane-order to the full hint build +
    ``cut_tight_native`` pipeline (the below-cut median splits never
    reorder, so stopping at the cut changes nothing the tight scene
    reads), at a fraction of the node construction: the ~2n-1-node flat
    tree was otherwise built only to be dissolved."""
    lib = _load()
    if lib is None or getattr(lib, "bvh_build_sah_clusters", None) is None \
            or lib.bvh_build_sah_clusters.argtypes is None:
        return None
    smin = np.ascontiguousarray(shape_min, np.float32)
    smax = np.ascontiguousarray(shape_max, np.float32)
    n = smin.shape[0]
    if n == 0 or smin.shape[1] != 3:
        return None
    cl_min = np.empty((n, 3), np.float32)
    cl_max = np.empty((n, 3), np.float32)
    tri_order = np.empty(n, np.int32)
    cl_off = np.empty(n + 1, np.int64)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lp = ctypes.POINTER(ctypes.c_int64)
    C = lib.bvh_build_sah_clusters(
        smin.ctypes.data_as(fp), smax.ctypes.data_as(fp), ctypes.c_int64(n),
        ctypes.c_int32(leaf_size), cl_min.ctypes.data_as(fp),
        cl_max.ctypes.data_as(fp), tri_order.ctypes.data_as(ip),
        cl_off.ctypes.data_as(lp))
    if C <= 0:
        return None
    return (cl_min[:C].copy(), cl_max[:C].copy(), tri_order,
            cl_off[: C + 1].copy())


def pack_clusters_native(a, b, c, tri_order, cl_off, W: int, cc,
                         groups, tri_map) -> bool:
    """Native group-row pack straight from cluster segments (no flat-tree
    walk); False when unavailable. Same row math as ``pack_tight_native``."""
    lib = _load()
    if lib is None or getattr(lib, "bvh_pack_clusters", None) is None \
            or lib.bvh_pack_clusters.argtypes is None:
        return False
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    c = np.ascontiguousarray(c, np.float32)
    tri_order = np.ascontiguousarray(tri_order, np.int32)
    cl_off = np.ascontiguousarray(cl_off, np.int64)
    cc = np.ascontiguousarray(cc, np.float32)
    C = cl_off.shape[0] - 1
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lp = ctypes.POINTER(ctypes.c_int64)
    rc = lib.bvh_pack_clusters(
        a.ctypes.data_as(fp), b.ctypes.data_as(fp), c.ctypes.data_as(fp),
        tri_order.ctypes.data_as(ip), cl_off.ctypes.data_as(lp),
        ctypes.c_int64(C), ctypes.c_int32(W), cc.ctypes.data_as(fp),
        groups.ctypes.data_as(fp), tri_map.ctypes.data_as(ip))
    return rc == 0


def build_wide_native(smem_binary: np.ndarray, num_clusters: int,
                      K: int = 16):
    """Native wide-table construction (csrc/pack.cpp::bvh_build_wide);
    None when unavailable or on any structural failure (caller falls back
    to the numpy ``build_wide_table`` — identical output)."""
    lib = _load()
    if lib is None or getattr(lib, "bvh_build_wide", None) is None \
            or lib.bvh_build_wide.argtypes is None:
        return None
    tab = np.ascontiguousarray(smem_binary, np.float32)
    nn = tab.shape[1]
    cap = max(3 * num_clusters + 64, 16)  # worst-case groups, bucketed
    gnodes = np.empty((7 * K + 1, cap), np.float32)
    gslot = np.zeros(num_clusters, np.int32)
    depth = ctypes.c_int32(0)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    Gn = lib.bvh_build_wide(
        tab.ctypes.data_as(fp), ctypes.c_int64(nn),
        ctypes.c_int64(num_clusters), ctypes.c_int32(K),
        gnodes.ctypes.data_as(fp), ctypes.c_int64(cap),
        gslot.ctypes.data_as(ip), ctypes.byref(depth))
    if Gn <= 0:
        return None
    # the C++ writes a dense [7K+1, Gn] block (column stride Gn) into the
    # flat buffer; re-view by the real stride and drop the spare capacity
    flat = gnodes.reshape(-1)[: (7 * K + 1) * Gn]
    return flat.reshape(7 * K + 1, Gn).copy(), gslot, int(depth.value)


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


def build_sah_auto(shape_min, shape_max, config=None, nthreads: int = 0,
                   cluster_hint: int = 0):
    """Native builder when available and applicable, numpy otherwise.

    The native path is f32/3-D; float64 inputs (the BHValue f64 tier) stay
    on the numpy builder so the tree keeps f64 resolution. ``cluster_hint``
    (see ``build_sah_native``) is a native-only speed hint; the numpy
    fallback ignores it (exact build — a strictly finer tree with the same
    cluster cuts, so callers see equivalent results either way)."""
    smin = np.asarray(shape_min)
    if (smin.shape[0] > 0 and smin.shape[1] == 3
            and smin.dtype != np.float64 and native_available()):
        return build_sah_native(shape_min, shape_max, nthreads,
                                cluster_hint=cluster_hint)
    from .bvh.sah_build import build_sah
    from .config import DEFAULT_CONFIG

    return build_sah(shape_min, shape_max, config or DEFAULT_CONFIG)


def tri_aabbs_native(a, b, c):
    """Native per-triangle AABBs; None when the library is unavailable."""
    lib = _load()
    if lib is None or getattr(lib, "bvh_tri_aabbs", None) is None \
            or lib.bvh_tri_aabbs.argtypes is None:
        return None
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    c = np.ascontiguousarray(c, np.float32)
    n = a.shape[0]
    mn = np.empty((n, 3), np.float32)
    mx = np.empty((n, 3), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.bvh_tri_aabbs(a.ctypes.data_as(fp), b.ctypes.data_as(fp),
                      c.ctypes.data_as(fp), ctypes.c_int64(n),
                      mn.ctypes.data_as(fp), mx.ctypes.data_as(fp))
    return mn, mx


def cut_tight_native(entry, exit_, leaf_size: int):
    """Native cluster cut (csrc/pack.cpp); None when unavailable."""
    lib = _load()
    if lib is None or getattr(lib, "bvh_cut_tight", None) is None \
            or lib.bvh_cut_tight.argtypes is None:
        return None
    entry = np.ascontiguousarray(entry, np.int32)
    exit_ = np.ascontiguousarray(exit_, np.int32)
    total = entry.shape[0]
    roots = np.empty((total + 1) // 2, np.int32)
    ip = ctypes.POINTER(ctypes.c_int32)
    C = lib.bvh_cut_tight(entry.ctypes.data_as(ip), exit_.ctypes.data_as(ip),
                          ctypes.c_int64(total), ctypes.c_int32(leaf_size),
                          roots.ctypes.data_as(ip))
    if C < 0:
        return None
    return roots[:C].copy()


def pack_tight_native(a, b, c, shape, entry, exit_, roots, W: int, cc,
                      groups, tri_map) -> bool:
    """Native group-row pack into caller buffers; False when unavailable."""
    lib = _load()
    if lib is None or getattr(lib, "bvh_pack_tight", None) is None \
            or lib.bvh_pack_tight.argtypes is None:
        return False
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    c = np.ascontiguousarray(c, np.float32)
    shape = np.ascontiguousarray(shape, np.int32)
    entry = np.ascontiguousarray(entry, np.int32)
    exit_ = np.ascontiguousarray(exit_, np.int32)
    roots = np.ascontiguousarray(roots, np.int32)
    cc = np.ascontiguousarray(cc, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.bvh_pack_tight(
        a.ctypes.data_as(fp), b.ctypes.data_as(fp), c.ctypes.data_as(fp),
        shape.ctypes.data_as(ip), entry.ctypes.data_as(ip),
        exit_.ctypes.data_as(ip), roots.ctypes.data_as(ip),
        ctypes.c_int64(roots.shape[0]), ctypes.c_int32(W),
        cc.ctypes.data_as(fp), groups.ctypes.data_as(fp),
        tri_map.ctypes.data_as(ip))
    return rc == 0
