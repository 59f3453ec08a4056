"""Interpret-mode sweep: wide iters vs {sort bits} x {packet} + planner diag."""
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
from bvh_tpu.ops.trace import (count_visits_wide, make_planner,
                               sort_rays_device)

n_cubes = int(os.environ.get("VC_CUBES", "10000"))
n_rays = int(os.environ.get("VC_RAYS", str(1 << 16)))

a, b, c = tb.create_n_cubes(n_cubes)
scene = build_tight_scene(a, b, c)
seed = tb.seed_state_after(n_cubes)
origins, dirs = tb.create_rays(n_rays, seed=seed)
o, d = jnp.asarray(origins), jnp.asarray(dirs)

for bits in (0, 2, 4, 6):
    if bits:
        perm, inv = sort_rays_device(o, d, bits=bits)
        rays = Ray.create(o[perm], d[perm])
    else:
        rays = Ray.create(o, d)
    for packet in (2048, 4096):
        it, fw, gt = count_visits_wide(scene, rays, packet=packet,
                                      interpret=True)
        tot = it.sum()
        print(f"bits={bits} P={packet}: iters/pkt {tot/len(it):7.0f} "
              f"iters/ray {tot/n_rays:6.2f} fires/pkt {fw.sum()/len(it):6.1f} "
              f"model@195ns {1e3/(tot/n_rays*195):5.1f} M rays/s", flush=True)

# planner diagnosis on the aimed workload
centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)
idx = np.sort(np.resize(np.arange(len(centers)), n_rays))
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_rays, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
aim_o = (centers[idx] + offs * 50.0).astype(np.float32)
aim_d = (centers[idx] + 0.1 - aim_o).astype(np.float32)
aimed = Ray.create(jnp.asarray(aim_o), jnp.asarray(aim_d))
for packet in (2048,):
    planner = make_planner(scene, packet=packet, interpret=True)
    hints_a, start_a = planner(aimed)
    sa = np.asarray(start_a)
    print(f"planner start_g: root-frac {(sa <= 0).mean():.3f} "
          f"uniq {len(np.unique(sa))} min {sa.min()} max {sa.max()}", flush=True)
