"""Verify driver: perm= fused sort-into-pack, end-to-end vs brute force."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import numpy as np
import jax

if os.environ.get("VERIFY_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")  # tunnel down: CPU fallback
INTERP = os.environ.get("VERIFY_TPU", "0") != "1"
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh.traverse import brute_force_closest_hit
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import sort_rays_device, trace_closest_hit_tight

a, b, c = tb.create_n_cubes(50)  # 600 tris
scene = build_tight_scene(a, b, c, use_native=False)
centers = a.reshape(-1, 12, 3).mean(axis=1)
n = 1100  # not a packet multiple
idx = np.resize(np.arange(len(centers)), n)
rng = np.random.default_rng(7)
offs = rng.normal(size=(n, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
o = (centers[idx] + offs * 45.0).astype(np.float32)
d = (centers[idx] + 0.13 - o).astype(np.float32)
oj, dj = jnp.asarray(o), jnp.asarray(d)
perm, inv = sort_rays_device(oj, dj, bits=2)
rays = Ray.create(oj, dj)
aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

got = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj), packet=1024,
                              interpret=INTERP, sweep=True, perm=perm)
t = np.asarray(got.t)[np.asarray(inv)]
sid = np.asarray(got.shape_id)[np.asarray(inv)]
want = brute_force_closest_hit(rays, aj, bj, cj)
tw = np.asarray(want.t)
assert (np.isfinite(t) == np.isfinite(tw)).all(), "hit mask mismatch"
both = np.isfinite(t)
assert both.sum() > n * 0.9, f"aimed rays should mostly hit ({both.sum()}/{n})"
np.testing.assert_allclose(t[both], tw[both], rtol=5e-3)
match = (sid[both] == np.asarray(want.shape_id)[both]).mean()
assert match > 0.97, f"winner id agreement {match}"
print(f"OK platform={jax.devices()[0].platform} hits={int(both.sum())}/{n} "
      f"id_match={match:.4f}")
