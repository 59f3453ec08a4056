"""Do bounce waves want a per-wave morton re-sort? (interpret-mode counts)

Replicates make_pathtracer's bounce generation for one wave on the dense
mesh, then counts wide-walk iters/fires for the bounce rays as-is
(primary order) vs morton re-sorted, and for the NEE shadow wave.
"""
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
from bvh_tpu.ops.trace import (count_visits_wide, sort_rays_device,
                               trace_closest_hit_tight)

ad, bd, cd = tb.create_dense_mesh(res=182)
aj, bj, cj = (jnp.asarray(x) for x in (ad, bd, cd))
scene = build_tight_scene(ad, bd, cd, leaf_size=128)
packet = 1024

Wd = Hd = 256
cam = camera_rays(np.array([0.0, 60.0, -120.0], np.float32),
                  np.array([0.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                  55.0, Wd, Hd)
o = np.asarray(cam.origin).reshape(Hd // 32, 32, Wd // 32, 32, 3)
o = o.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
d = np.asarray(cam.direction).reshape(Hd // 32, 32, Wd // 32, 32, 3)
d = d.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
rays = Ray.create(jnp.asarray(o), jnp.asarray(d))

hit = trace_closest_hit_tight(scene, rays, packet=packet, interpret=True)
t = hit.t
sid = jnp.maximum(hit.shape_id, 0)
found = np.asarray(jnp.isfinite(t))
print(f"primary hit rate {found.mean():.3f}", flush=True)


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
p = rays.origin + rays.direction * t_safe[:, None]
nrm = _normalize(jnp.cross(bj[sid] - aj[sid], cj[sid] - aj[sid]))
nrm = jnp.where((jnp.sum(nrm * rays.direction, -1) > 0)[:, None], -nrm, nrm)
key = jax.random.PRNGKey(0)
u = _normalize(jax.random.normal(key, (o.shape[0], 3), jnp.float32))
u = jnp.where(jnp.sum(u * nrm, -1, keepdims=True) < 0, -u, u)
alive = jnp.asarray(found)
bo = jnp.where(alive[:, None], p + nrm * 1e-3, 2.0e30)
bd_ = jnp.where(alive[:, None], _normalize(nrm + u), 1.0)
bounce = Ray.create(bo, bd_)

# NEE shadow wave
lp = jnp.asarray([12.0, 22.0, 8.0], jnp.float32)
to_l = lp[None] - p
wl = _normalize(to_l)
sh_o = jnp.where(alive[:, None], p + nrm * 1e-3, 2.0e30)
shadow = Ray.create(sh_o, wl)

for name, rr in (("bounce", bounce), ("shadow", shadow)):
    it0, fw0, _ = count_visits_wide(scene, rr, packet=packet, interpret=True)
    perm, _ = sort_rays_device(rr.origin, rr.direction, mode="morton")
    rs = Ray.create(rr.origin[perm], rr.direction[perm])
    it1, fw1, _ = count_visits_wide(scene, rs, packet=packet, interpret=True)
    npk = len(it0)
    print(f"{name}: as-is iters/pkt {it0.sum()/npk:6.0f} fires {fw0.sum()/npk:6.1f}"
          f" | morton iters/pkt {it1.sum()/npk:6.0f} fires {fw1.sum()/npk:6.1f}",
          flush=True)
