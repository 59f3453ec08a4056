"""Camera-workload planner engagement: 32x32 tiles vs morton sort (CPU)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.diff.camera import camera_rays
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (count_visits_wide, make_planner,
                               sort_rays_device)

ad, bd, cd = tb.create_dense_mesh(res=182)  # ~66k tris (CPU-sized)
scene = build_tight_scene(ad, bd, cd, leaf_size=128)
print("tris", len(ad), "clusters", scene.num_clusters, flush=True)

Wd = Hd = 256
cam = camera_rays(np.array([0.0, 60.0, -120.0], np.float32),
                  np.array([0.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                  55.0, Wd, Hd)
o = np.asarray(cam.origin)
d = np.asarray(cam.direction)

packet = 1024
planner = make_planner(scene, packet=packet, interpret=True)

def tile(x):
    t = x.reshape(Hd // 32, 32, Wd // 32, 32, 3)
    return t.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

variants = {
    "raster": (o, d),
    "tile32": (tile(o), tile(d)),
}
oj, dj = jnp.asarray(o), jnp.asarray(d)
perm, _ = sort_rays_device(oj, dj, mode="morton")
variants["morton"] = (np.asarray(oj[perm]), np.asarray(dj[perm]))

for name, (ov, dv) in variants.items():
    rays = Ray.create(jnp.asarray(ov), jnp.asarray(dv))
    hints, start = planner(rays)
    sa = np.asarray(start)
    itp, fwp, _ = count_visits_wide(scene, rays, packet=packet,
                                    interpret=True, start_g=start)
    itn, fwn, _ = count_visits_wide(scene, rays, packet=packet,
                                    interpret=True)
    npk = len(itp)
    print(f"{name:7s}: root-frac {(sa < 0).mean():.3f} "
          f"planned iters/pkt {itp.sum()/npk:6.0f} fires {fwp.sum()/npk:6.1f} "
          f"| plain iters/pkt {itn.sum()/npk:6.0f} fires {fwn.sum()/npk:6.1f}",
          flush=True)
