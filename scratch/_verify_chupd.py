"""Verify driver: chained mask+delta updater end-to-end vs brute force."""
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
from bvh_tpu.ops import make_chained_updater
from bvh_tpu.ops.cluster import build_chained_scene
from bvh_tpu.ops.trace import trace_closest_hit_chained

rng = np.random.default_rng(9)
a, b, c = tb.create_n_cubes(180)
a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
ch = build_chained_scene(a, b, c, max_part=800)
moved_cubes = rng.choice(180, size=5, replace=False)
moved = np.concatenate([np.arange(12) + 12 * k for k in moved_cubes]).astype(np.int32)
a2, b2, c2 = a.copy(), b.copy(), c.copy()
for arr in (a2, b2, c2):
    arr[moved] += rng.uniform(10, 50, size=(3,)).astype(np.float32)
upd = make_chained_updater(ch, max_moved=64)
pad = np.full(64, -1, np.int32); pad[:len(moved)] = moved
ch2 = upd(a2, b2, c2, pad)
centers = ((a2 + b2 + c2) / 3.0)
n = 800
o = rng.uniform(-80, 80, (n, 3)).astype(np.float32)
d = (centers[rng.integers(0, len(a2), n)] - o).astype(np.float32)
rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
got = trace_closest_hit_chained(ch2, rays, packet=1024, interpret=INTERP)
want = brute_force_closest_hit(rays, jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2))
tg, tw = np.asarray(got.t), np.asarray(want.t)
agree = (np.isfinite(tg) == np.isfinite(tw)).mean()
assert agree > 0.99, agree
both = np.isfinite(tg) & np.isfinite(tw)
np.testing.assert_allclose(tg[both], tw[both], rtol=1e-2)
print(f"OK platform={jax.devices()[0].platform} parts={len(ch2.parts)} hits={int(both.sum())}/{n} agree={agree:.4f}")
