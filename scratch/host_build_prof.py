"""Host kernel-ready build breakdown at 120k tris (single core)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from bvh_tpu import testbase as tb
from bvh_tpu.config import DEFAULT_CONFIG
from bvh_tpu.native import (build_sah_auto, cut_tight_native,
                            pack_tight_native, tri_aabbs_native)
from bvh_tpu.ops.cluster import build_tight_scene

a, b, c = tb.create_n_cubes(10000)
a, b, c = (np.asarray(x, np.float32) for x in (a, b, c))


def timeit(label, fn, n=5):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:7.2f} ms", flush=True)
    return best

timeit("tri_aabbs_native", lambda: tri_aabbs_native(a, b, c))
mn, mx = tri_aabbs_native(a, b, c)
timeit("build_sah_auto (lower)", lambda: build_sah_auto(mn, mx, DEFAULT_CONFIG))
timeit("build_sah_auto (lower, hint=16)",
       lambda: build_sah_auto(mn, mx, DEFAULT_CONFIG, cluster_hint=16))
flat, _ = build_sah_auto(mn, mx, DEFAULT_CONFIG)
timeit("cut_tight_native", lambda: cut_tight_native(flat.entry, flat.exit, 16))
roots = cut_tight_native(flat.entry, flat.exit, 16)
cl_min = np.asarray(flat.aabb_min)[roots]
cl_max = np.asarray(flat.aabb_max)[roots]
timeit("build_sah_auto (upper)", lambda: build_sah_auto(cl_min, cl_max,
                                                        DEFAULT_CONFIG))

from bvh_tpu.ops import cluster as cl
up, _ = build_sah_auto(cl_min, cl_max, DEFAULT_CONFIG)
nn = up.num_nodes
entry = np.asarray(up.entry, np.float32).copy()
leaf_m = np.asarray(up.entry) < 0
entry[leaf_m] = -(np.asarray(up.shape)[leaf_m].astype(np.float32) + 1.0)
smem = np.zeros((8, nn), np.float32)
smem[0:3] = np.asarray(up.aabb_min).T
smem[3:6] = np.asarray(up.aabb_max).T
smem[6] = entry
smem[7] = np.asarray(up.exit, np.float32)
timeit("collapse_upper", lambda: cl.collapse_upper(smem, 16))
smem_c = cl.collapse_upper(smem, 16)
timeit("build_wide_table", lambda: cl.build_wide_table(smem, len(roots)))
cc = ((cl_min + cl_max) * 0.5).astype(np.float32)
C = len(roots)
G = -(-C // 8)
groups = np.zeros((G, 16, 128), np.float32)
tri_map = np.full(G * 8 * 16, -1, np.int32)
timeit("pack_tight_native", lambda: pack_tight_native(
    a, b, c, flat.shape, flat.entry, flat.exit, roots, 16, cc,
    groups, tri_map))

timeit("build_tight_scene e2e", lambda: build_tight_scene(a, b, c), n=3)
