"""Overlap-penalized SAH sweep: does it cut packet-walk iters/fires?

Interpret-mode counters on the random + aimed workloads, lam sweep.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import dataclasses

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.config import DEFAULT_CONFIG
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (count_visits_wide, make_planner,
                               sort_rays_device)

n_cubes = int(os.environ.get("VC_CUBES", "10000"))
n_rays = int(os.environ.get("VC_RAYS", str(1 << 16)))
packet = 2048

a, b, c = tb.create_n_cubes(n_cubes)
a, b, c = (np.asarray(x) for x in (a, b, c))

seed = tb.seed_state_after(n_cubes)
o_r, d_r = tb.create_rays(n_rays, seed=seed)
o_r, d_r = jnp.asarray(o_r), jnp.asarray(d_r)

centers = a.reshape(-1, 12, 3).mean(axis=1)
idx = np.resize(np.arange(len(centers)), n_rays)
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_rays, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
o_a = jnp.asarray((centers[idx] + offs * 50.0).astype(np.float32))
d_a = jnp.asarray((centers[idx] + 0.1 - np.asarray(o_a)).astype(np.float32))

perm_r, _ = sort_rays_device(o_r, d_r, bits=2)
rays_r = Ray.create(o_r[perm_r], d_r[perm_r])
perm_a, _ = sort_rays_device(o_a, d_a, mode="morton")
rays_a = Ray.create(o_a[perm_a], d_a[perm_a])

for lam in (0.0, 0.25, 0.5, 1.0, 2.0):
    cfg = dataclasses.replace(DEFAULT_CONFIG, overlap_penalty=lam)
    scene = build_tight_scene(a, b, c, config=cfg, use_native=(lam == 0.0))
    itr, fwr, _ = count_visits_wide(scene, rays_r, packet=packet,
                                    interpret=True)
    planner = make_planner(scene, packet=packet, interpret=True)
    _, start = planner(rays_a)
    ita, fwa, _ = count_visits_wide(scene, rays_a, packet=packet,
                                    interpret=True, start_g=start)
    npr, npa = len(itr), len(ita)
    print(f"lam={lam:4.2f}: random iters/pkt {itr.sum()/npr:6.0f} "
          f"fires {fwr.sum()/npr:5.1f} | aimed(planned) iters/pkt "
          f"{ita.sum()/npa:6.0f} fires {fwa.sum()/npa:6.1f}", flush=True)
