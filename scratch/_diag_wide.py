"""Wide-kernel diagnosis: counters + packet-size sweep on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

import numpy as np
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (count_visits_tight, count_visits_wide,
                               sort_rays_device, trace_closest_hit_tight)

n_cubes = int(os.environ.get("BW_CUBES", "10000"))
n_rays = int(os.environ.get("BW_RAYS", str(1 << 20)))

a, b, c = tb.create_n_cubes(n_cubes)
scene = build_tight_scene(a, b, c)
seed = tb.seed_state_after(n_cubes)
origins, dirs = tb.create_rays(n_rays, seed=seed)
o_dev = jnp.asarray(origins)
d_dev = jnp.asarray(dirs)
perm, inv = sort_rays_device(o_dev, d_dev, bits=2)
rays = Ray.create(o_dev[perm], d_dev[perm])

for packet in (1024, 2048, 4096):
    it, fi, gt = count_visits_wide(scene, rays, packet=packet)
    vi, tf = count_visits_tight(scene, rays, packet=packet)
    npk = len(it)
    print(f"P={packet}: wide iters/pkt {it.sum()/npk:.0f} fires {fi.sum()/npk:.0f} "
          f"gtests {gt.sum()/npk:.0f} | tight visits/pkt {vi.sum()/npk:.0f} "
          f"fires {tf.sum()/npk:.0f}", flush=True)

    def run(wide):
        out = trace_closest_hit_tight(scene, rays, packet=packet, wide=wide)
        return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))

    for wide in (False, True):
        run(wide)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(wide)
            best = min(best, time.perf_counter() - t0)
        tag = "wide " if wide else "tight"
        print(f"  {tag} ungated P={packet}: {n_rays/best/1e6:.2f} M rays/s "
              f"({best:.3f} s)", flush=True)
