"""Pallas TPU kernels: the performance-bearing compute path.

The reference's performance-native components (SIMD slab test, flat
traversal, SAH build inner loops — survey §2 items 1,4,5,6,10-13,16,17) map
here to TPU kernels built around two hardware facts measured on-chip:

* a scalar-driven while loop step costs ~10 ns, and an SMEM-scalar +
  8x128-VPU packet step ~150 ns — so traversal runs as *packet* traversal
  (one shared cursor per 1024-ray packet, scalar reads from SMEM);
* per-lane dynamic gathers don't exist on the VPU — so the triangle test
  runs *dense* on the MXU: Moller-Trumbore decomposes into bilinear forms
  (det = d.(e2 x e1), u.det = m.e2 - d.(e2 x a), v.det = -m.e1 + d.(e1 x a),
  t.det = o.n - a.n with m = o x d), i.e. one [rays, 16] @ [16, 4*128]
  matmul per cluster of 128 triangles.
"""

from .cluster import ClusterScene, TightScene, build_cluster_scene, build_tight_scene
from .trace import sort_rays, sort_rays_device, trace_closest_hit, trace_closest_hit_tight

__all__ = [
    "ClusterScene",
    "TightScene",
    "build_cluster_scene",
    "build_tight_scene",
    "trace_closest_hit",
    "trace_closest_hit_tight",
    "sort_rays",
    "sort_rays_device",
]
