"""Interpret-mode visit accounting: wide vs tight walk, random workload.

Hardware-independent measurement of the #1 perf lever (visit count).
Cost model: tight = visits x ~195ns; wide = iters x chain + gtests x vec.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (count_visits_tight, count_visits_wide,
                               make_planner, sort_rays_device)

n_cubes = int(os.environ.get("VC_CUBES", "10000"))
n_rays = int(os.environ.get("VC_RAYS", str(1 << 16)))
packet = int(os.environ.get("VC_PACKET", "2048"))

a, b, c = tb.create_n_cubes(n_cubes)
scene = build_tight_scene(a, b, c)
print(f"tris={len(a)} clusters={scene.num_clusters} nodes={scene.num_nodes} "
      f"gnodes={None if scene.gnodes is None else scene.gnodes.shape}",
      flush=True)

seed = tb.seed_state_after(n_cubes)
origins, dirs = tb.create_rays(n_rays, seed=seed)
o, d = jnp.asarray(origins), jnp.asarray(dirs)
perm, inv = sort_rays_device(o, d, bits=2)
rays = Ray.create(o[perm], d[perm])

t0 = time.time()
vi, fi = count_visits_tight(scene, rays, packet=packet, interpret=True)
npk = len(vi)
print(f"tight:  visits/pkt {vi.sum()/npk:8.0f}  fires/pkt {fi.sum()/npk:6.1f}"
      f"  ({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
it, fw, gt = count_visits_wide(scene, rays, packet=packet, interpret=True)
print(f"wide:   iters/pkt  {it.sum()/npk:8.0f}  fires/pkt {fw.sum()/npk:6.1f}"
      f"  gtests/pkt {gt.sum()/npk:8.0f}  ({time.time()-t0:.0f}s)", flush=True)

# est: tight 195ns/visit; wide chain assumed ~same per iter
for ns in (195.0,):
    sol_t = vi.sum() / npk * ns * npk / (n_rays / 1e9)
    sol_w = it.sum() / npk * ns * npk / (n_rays / 1e9)
    print(f"model @ {ns:.0f}ns: tight {1e3/ (vi.sum()/n_rays*ns):.1f} M rays/s"
          f" | wide {1e3/(it.sum()/n_rays*ns):.1f} M rays/s", flush=True)

# aimed workload (hit-dense): planner vs plain
n_aimed = n_rays
centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)
idx = np.sort(np.resize(np.arange(len(centers)), n_aimed))
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_aimed, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
aim_o = (centers[idx] + offs * 50.0).astype(np.float32)
aim_d = (centers[idx] + 0.1 - aim_o).astype(np.float32)
aimed = Ray.create(jnp.asarray(aim_o), jnp.asarray(aim_d))

t0 = time.time()
planner = make_planner(scene, packet=packet, interpret=True)
hints_a, start_a = planner(aimed)
it2, fw2, gt2 = count_visits_wide(scene, aimed, packet=packet, interpret=True,
                                  start_g=start_a)
it3, fw3, gt3 = count_visits_wide(scene, aimed, packet=packet, interpret=True)
npk2 = len(it2)
print(f"aimed wide planned: iters/pkt {it2.sum()/npk2:8.0f} fires {fw2.sum()/npk2:6.1f}"
      f" | plain iters/pkt {it3.sum()/npk2:8.0f} fires {fw3.sum()/npk2:6.1f}"
      f"  ({time.time()-t0:.0f}s)", flush=True)
print(f"model @195ns aimed: planned {1e3/(it2.sum()/n_aimed*195):.1f}"
      f" | plain {1e3/(it3.sum()/n_aimed*195):.1f} M rays/s", flush=True)
