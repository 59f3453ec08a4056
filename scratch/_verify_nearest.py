"""Verify driver: nearest_tight through the public API vs brute oracle.

Tries the real TPU; if the axon tunnel is unreachable (known wedge), falls
back to the CPU platform with the interpret-mode kernel — same code path
through pl.pallas_call.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import jax
interpret = False
try:
    import signal

    def _alarm(sig, frm):
        raise TimeoutError

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(60)
    import jax.numpy as _j
    float(_j.sum(_j.arange(4.0)))
    signal.alarm(0)
except (TimeoutError, Exception):
    signal.alarm(0)
    jax.config.update("jax_platforms", "cpu")
    interpret = True
    print("TPU unreachable -> CPU interpret fallback", flush=True)

import jax.numpy as jnp
from bvh_tpu import testbase as tb
from bvh_tpu.ops import build_tight_scene, nearest_tight
from bvh_tpu.tri import point_triangle_distance_squared

rng = np.random.default_rng(21)
a, b, c = tb.create_n_cubes(300)
scene = build_tight_scene(a, b, c)
centers = a.reshape(-1, 12, 3).mean(axis=1)
npts = 2048
pts = (centers[rng.integers(0, len(centers), npts)]
       + rng.normal(scale=30.0, size=(npts, 3))).astype(np.float32)
sid, dist = nearest_tight(scene, pts, interpret=interpret, packet=512)
sid, dist = np.asarray(sid), np.asarray(dist)
d2b = point_triangle_distance_squared(
    jnp.asarray(pts)[:, None, :], jnp.asarray(a)[None], jnp.asarray(b)[None],
    jnp.asarray(c)[None])
bd = np.sqrt(np.asarray(d2b).min(axis=1))
assert (sid >= 0).all()
np.testing.assert_allclose(dist, bd, rtol=1e-4, atol=0.01)
# winner's own distance matches the reported distance
dwin = np.sqrt(np.asarray(point_triangle_distance_squared(
    jnp.asarray(pts), jnp.asarray(a)[sid], jnp.asarray(b)[sid],
    jnp.asarray(c)[sid])))
np.testing.assert_allclose(dist, dwin, rtol=1e-4, atol=0.01)
print(f"nearest_tight: {npts} points vs {len(a)} tris exact "
      f"(max |d-oracle| {np.abs(dist-bd).max():.2e}) VERIFY PASS", flush=True)
