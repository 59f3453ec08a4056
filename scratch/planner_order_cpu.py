"""Does tree-aligned aimed-ray ordering activate the planner's subtree entry?

Compares cube-index order (bench.py today) vs target-cluster (DFS/tree)
order: planner root-frac + wide iters planned vs plain.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import count_visits_wide, make_planner

n_cubes = int(os.environ.get("VC_CUBES", "10000"))
n_rays = int(os.environ.get("VC_RAYS", str(1 << 16)))
packet = 2048

a, b, c = tb.create_n_cubes(n_cubes)
scene = build_tight_scene(a, b, c)
W = scene.width
tri_map = np.asarray(scene.tri_map)
n_tris = len(a)
cluster_of_tri = np.zeros(n_tris, np.int64)
occ = tri_map >= 0
cluster_of_tri[tri_map[occ]] = np.nonzero(occ)[0] // W

centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)
idx0 = np.resize(np.arange(len(centers)), n_rays)
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_rays, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)

planner = make_planner(scene, packet=packet, interpret=True)

for name, order in (
    ("cube-index", np.argsort(idx0, kind="stable")),
    ("target-cluster", np.argsort(cluster_of_tri[idx0 * 12], kind="stable")),
):
    idx = idx0[order]
    o_ = (centers[idx] + offs * 50.0).astype(np.float32)
    d_ = (centers[idx] + 0.1 - o_).astype(np.float32)
    aimed = Ray.create(jnp.asarray(o_), jnp.asarray(d_))
    hints, start = planner(aimed)
    sa = np.asarray(start)
    itp, fwp, _ = count_visits_wide(scene, aimed, packet=packet,
                                    interpret=True, start_g=start)
    itn, fwn, _ = count_visits_wide(scene, aimed, packet=packet,
                                    interpret=True)
    npk = len(itp)
    print(f"{name:16s}: root-frac {(sa < 0).mean():.3f} "
          f"planned iters/pkt {itp.sum()/npk:6.0f} fires {fwp.sum()/npk:6.1f} "
          f"| plain iters/pkt {itn.sum()/npk:6.0f} fires {fwn.sum()/npk:6.1f}",
          flush=True)

# does the PUBLIC ray sort (origin/direction buckets) approximate the
# target-cluster oracle ordering?
from bvh_tpu.ops.trace import sort_rays_device
idx = idx0[np.argsort(idx0, kind="stable")]
o_ = (centers[idx] + offs * 50.0).astype(np.float32)
d_ = (centers[idx] + 0.1 - o_).astype(np.float32)
oj, dj = jnp.asarray(o_), jnp.asarray(d_)
for bits in (2, 4, 6, 8):
    perm, inv = sort_rays_device(oj, dj, bits=bits)
    aimed = Ray.create(oj[perm], dj[perm])
    hints, start = planner(aimed)
    sa = np.asarray(start)
    itp, fwp, _ = count_visits_wide(scene, aimed, packet=packet,
                                    interpret=True, start_g=start)
    itn, fwn, _ = count_visits_wide(scene, aimed, packet=packet,
                                    interpret=True)
    npk = len(itp)
    print(f"ray-sort bits={bits}: root-frac {(sa < 0).mean():.3f} "
          f"planned iters/pkt {itp.sum()/npk:6.0f} "
          f"| plain iters/pkt {itn.sum()/npk:6.0f}", flush=True)
