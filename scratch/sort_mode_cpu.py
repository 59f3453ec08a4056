"""A/B: sort_rays_device mode octant-lex vs morton, random + aimed workloads."""
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
from bvh_tpu.ops.trace import (count_visits_wide, make_planner,
                               sort_rays_device)

n_cubes = int(os.environ.get("VC_CUBES", "10000"))
n_rays = int(os.environ.get("VC_RAYS", str(1 << 16)))
packet = 2048

a, b, c = tb.create_n_cubes(n_cubes)
scene = build_tight_scene(a, b, c)
planner = make_planner(scene, packet=packet, interpret=True)

seed = tb.seed_state_after(n_cubes)
origins, dirs = tb.create_rays(n_rays, seed=seed)
o_r, d_r = jnp.asarray(origins), jnp.asarray(dirs)

centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)
idx = np.resize(np.arange(len(centers)), n_rays)
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_rays, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
o_a = jnp.asarray((centers[idx] + offs * 50.0).astype(np.float32))
d_a = jnp.asarray((centers[idx] + 0.1 - np.asarray(o_a)).astype(np.float32))

for wname, oj, dj in (("random", o_r, d_r), ("aimed", o_a, d_a)):
    for mode in ("octant", "morton"):
        perm, inv = sort_rays_device(oj, dj, bits=2, mode=mode)
        rays = Ray.create(oj[perm], dj[perm])
        hints, start = planner(rays)
        sa = np.asarray(start)
        itp, fwp, _ = count_visits_wide(scene, rays, packet=packet,
                                        interpret=True, start_g=start)
        itn, fwn, _ = count_visits_wide(scene, rays, packet=packet,
                                        interpret=True)
        npk = len(itp)
        noent = (sa[:, 0] < 0).mean() if sa.ndim == 2 else (sa < 0).mean()
        two = (sa[:, 1] > 0).mean() if sa.ndim == 2 else 0.0
        print(f"{wname:6s} {mode:6s}: no-entry {noent:.3f} two {two:.3f} "
              f"planned iters/pkt {itp.sum()/npk:6.0f} "
              f"| plain iters/pkt {itn.sum()/npk:6.0f} "
              f"fires/pkt {fwn.sum()/npk:6.1f}", flush=True)
