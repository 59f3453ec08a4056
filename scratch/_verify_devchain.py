"""Verify driver: device chained build end-to-end vs brute force."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import numpy as np
import jax
if os.environ.get("VERIFY_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
INTERP = os.environ.get("VERIFY_TPU", "0") != "1"
import jax.numpy as jnp
from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh.traverse import brute_force_closest_hit
from bvh_tpu.ops import build_chained_scene_device
from bvh_tpu.ops.trace import trace_closest_hit_chained, trace_any_hit_chained

a, b, c = tb.create_n_cubes(200)  # 2400 tris, 4 parts at max_part=600
ch = build_chained_scene_device(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(c), max_part=600)
assert len(ch.parts) == 4, len(ch.parts)
centers = a.reshape(-1, 12, 3).mean(axis=1)
n = 1024
rng = np.random.default_rng(3)
idx = rng.integers(0, len(centers), n)
offs = rng.normal(size=(n, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
o = (centers[idx] + offs * 60.0).astype(np.float32)
d = (centers[idx] + 0.2 - o).astype(np.float32)
flip = rng.random(n) < 0.3
d[flip] = offs[flip]
rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
got = trace_closest_hit_chained(ch, rays, packet=1024, interpret=INTERP)
want = brute_force_closest_hit(rays, aj, bj, cj)
tg, tw = np.asarray(got.t), np.asarray(want.t)
agree = (np.isfinite(tg) == np.isfinite(tw)).mean()
assert agree > 0.99, agree
both = np.isfinite(tg) & np.isfinite(tw)
np.testing.assert_allclose(tg[both], tw[both], rtol=1e-2)
occ = np.asarray(trace_any_hit_chained(ch, rays, packet=1024, interpret=INTERP))
assert (occ == np.isfinite(tg)).all()
print(f"OK platform={jax.devices()[0].platform} parts={len(ch.parts)} "
      f"hits={int(both.sum())}/{n} agree={agree:.4f}")
