"""Pallas TPU kernels: the performance-bearing compute path.

The reference's performance-native components (SIMD slab test, flat
traversal, SAH build inner loops — survey §2 items 1,4,5,6,10-13,16,17) map
here to TPU kernels built around hardware facts measured on-chip:

* per-lane dynamic gathers don't exist on the VPU — so traversal runs as
  *packet* traversal (one shared cursor per 1024-4096-ray packet, node
  scalars read from SMEM, the slab test as one FMA per bound on the whole
  packet) and the triangle test runs *dense* on the MXU: Moller-Trumbore
  decomposes into bilinear forms (det = d.(e2 x e1), u.det = m.e2 - d.(e2 x a),
  v.det = -m.e1 + d.(e1 x a), t.det = o.n - a.n with m = o x d), i.e. one
  [rays, 16] @ [16, 4W] matmul per W-triangle leaf cluster;
* leaf clusters are SAH-cut subtrees (16 triangles for sparse scenes, up to
  128 for dense meshes) so leaf boxes stay as tight as the reference's own
  subtrees — the loose-Morton 128-clusters of ``ClusterScene`` are kept as
  the earlier/simpler variant;
* a traversal visit costs ~160-195 ns regardless of loop shape (the serial
  SMEM -> vector slab -> reduce -> select chain; round-2 measurement notes
  in ``trace.py`` and CLAUDE.md) — so the levers are visit COUNT (16-ary
  collapse, coherence sort, seeding) and per-packet gating (``sweep=True``:
  a narrowphase-free pre-pass kernel skips packets that cannot hit);
* scenes beyond one SMEM node table chain Morton-partitioned parts with the
  carried best-t pruning each next part (``build_chained_scene``).
"""

from .cluster import (
    ChainedScene,
    ClusterScene,
    TightScene,
    build_chained_scene,
    build_cluster_scene,
    build_tight_scene,
    collapse_upper,
    pack_node_table_bf16,
)
from .device_build import (build_chained_scene_device,
                           build_tight_scene_device, make_refitter)
from .update import make_chained_updater, make_updater
from .validate_scene import assert_tight_scene, check_tight_scene
from .nearest import count_visits_nearest, nearest_chained, nearest_tight
from .ordered import trace_k_closest, trace_k_closest_chained
from .trace import (
    count_visits_tight,
    count_visits_wide,
    make_key_planner,
    make_planner,
    make_seeder,
    sort_rays,
    sort_rays_device,
    trace_any_hit_chained,
    trace_any_hit_tight,
    trace_closest_hit,
    trace_closest_hit_chained,
    trace_closest_hit_seeded,
    make_tracer,
    trace_closest_hit_tight,
)

__all__ = [
    "ChainedScene",
    "ClusterScene",
    "TightScene",
    "build_chained_scene",
    "build_cluster_scene",
    "build_tight_scene",
    "build_chained_scene_device",
    "build_tight_scene_device",
    "collapse_upper",
    "count_visits_nearest",
    "count_visits_tight",
    "count_visits_wide",
    "make_key_planner",
    "make_planner",
    "make_refitter",
    "assert_tight_scene",
    "check_tight_scene",
    "make_chained_updater",
    "make_updater",
    "nearest_chained",
    "nearest_tight",
    "make_seeder",
    "pack_node_table_bf16",
    "trace_closest_hit",
    "trace_k_closest",
    "trace_k_closest_chained",
    "make_tracer",
    "trace_closest_hit_tight",
    "trace_closest_hit_seeded",
    "trace_closest_hit_chained",
    "trace_any_hit_tight",
    "trace_any_hit_chained",
    "sort_rays",
    "sort_rays_device",
]
