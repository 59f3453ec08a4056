import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from bvh_tpu import testbase
from bvh_tpu.ray import Ray
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import trace_closest_hit_tight, trace_any_hit_tight

rng = np.random.default_rng(3)
tris = testbase.create_n_cubes(100)
a, b, c = (np.asarray(t, np.float32) for t in tris)
scene = build_tight_scene(a, b, c)
print("gnodes", None if scene.gnodes is None else scene.gnodes.shape,
      "depth", scene.gdepth)

n = 4096
centers = (a + b + c) / 3.0
tgt = centers[rng.integers(0, len(a), n)]
o = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
d = (tgt - o).astype(np.float32)
# half the rays random (mostly miss)
d[n // 2:] = rng.normal(size=(n // 2, 3)).astype(np.float32)
rays = Ray.create(o, d)

hw = trace_closest_hit_tight(scene, rays, interpret=True, wide=True)
ht = trace_closest_hit_tight(scene, rays, interpret=True, wide=False)
tw, tt = np.asarray(hw.t), np.asarray(ht.t)
assert (np.isfinite(tw) == np.isfinite(tt)).all(), (np.isfinite(tw).sum(), np.isfinite(tt).sum())
m = np.isfinite(tw)
assert (tw[m] == tt[m]).all(), np.abs(tw[m] - tt[m]).max()
assert (np.asarray(hw.shape_id) == np.asarray(ht.shape_id)).all()
print("closest bit-identical:", m.sum(), "hits of", n)

tmx = np.where(np.isfinite(tt), tt * 1.1, 1.0).astype(np.float32)
aw = np.asarray(trace_any_hit_tight(scene, rays, t_max=tmx, interpret=True, wide=True))
at = np.asarray(trace_any_hit_tight(scene, rays, t_max=tmx, interpret=True, wide=False))
assert (aw == at).all(), (aw.sum(), at.sum())
print("any-hit identical:", aw.sum())

# sweep + hints
from bvh_tpu.ops.trace import compute_seed_hints
hints = compute_seed_hints(scene, rays, interpret=True)
hs = trace_closest_hit_tight(scene, rays, interpret=True, wide=True, hints=hints, sweep=True)
assert (np.asarray(hs.t)[m] == tt[m]).all()
assert (np.isfinite(np.asarray(hs.t)) == np.isfinite(tt)).all()
print("seeded+sweep wide identical")
print("SMOKE PASS")
