"""Judge verify driver: public API end-to-end on the real TPU.

Mirrors the round-3 driver verify: kernel closest-hit vs brute oracle on a
float scene (mixed hits/misses), hit-semantics probes, nearest vs brute.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ray import ray_intersects_aabb, ray_intersects_triangle
from bvh_tpu.ops import build_tight_scene, trace_closest_hit_tight
from bvh_tpu.ops.nearest import nearest_tight

print("platform:", jax.devices()[0].platform, jax.devices()[0])

rng = np.random.default_rng(7)
a, b, c = tb.create_n_cubes(300)  # 3600 tris
scene = build_tight_scene(a, b, c)
centers = a.reshape(-1, 12, 3).mean(axis=1)
n = 4096
idx = rng.integers(0, len(centers), n)
offs = rng.normal(size=(n, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
o = (centers[idx] + offs * float(rng.uniform(20, 120))).astype(np.float32)
d = (centers[idx] + 0.1 - o).astype(np.float32)
flip = rng.random(n) < 0.3
d[flip] = offs[flip]
rays = Ray.create(jnp.asarray(o), jnp.asarray(d))

out = trace_closest_hit_tight(scene, rays, packet=512)
t_k = np.asarray(out.t)
sid_k = np.asarray(out.shape_id)

# brute oracle on the same rays (public Moller-Trumbore). Build the Ray
# directly — Ray.create would RE-normalize the already-unit directions
# (divide by a norm ~1.0), perturbing direction bits vs the kernel's rays
# right at the exact-mask-agreement gate (advisor r4).
rays_b = Ray(rays.origin[:, None, :].repeat(a.shape[0], 1),
             rays.direction[:, None, :].repeat(a.shape[0], 1),
             rays.inv_direction[:, None, :].repeat(a.shape[0], 1))
inter = ray_intersects_triangle(
    rays_b, jnp.asarray(a)[None], jnp.asarray(b)[None], jnp.asarray(c)[None])
dist = np.asarray(inter.distance)
t_b = dist.min(axis=1)
hit_b = np.isfinite(t_b)
hit_k = np.isfinite(t_k)
agree = (hit_b == hit_k).mean()
both = hit_b & hit_k
dt = np.abs(t_k[both] - t_b[both])
rel = dt / np.maximum(t_b[both], 1e-6)
print(f"closest-hit vs brute: mask agree {agree:.6f}, "
      f"max|dt| {dt.max():.3e}, max rel {rel.max():.3e}, hits {both.mean():.3f}")
bad = np.nonzero(hit_b != hit_k)[0]
if len(bad):
    for i in bad[:8]:
        print(f"  mismatch ray {i}: brute t={t_b[i]:.6f} kernel t={t_k[i]:.6f}")
# winner distance must match the winner's own brute distance (id may differ
# on exact ties); require the kernel's t to be within 1e-3 rel of brute best
ok_sem = agree == 1.0 and (rel < 1e-3).all()

# probes: face-plane ray (NaN => miss on the pure-JAX path)
mn = jnp.asarray([[0.0, 0.0, 0.0]]); mx = jnp.asarray([[1.0, 1.0, 1.0]])
r_face = Ray.create(jnp.asarray([[0.5, 0.5, -1.0]]), jnp.asarray([[0.0, 1.0, 0.0]]))
face_hit = bool(np.asarray(ray_intersects_aabb(r_face, mn, mx))[0])
print("face-plane pure-JAX slab hit (reference says miss):", face_hit)

# backface culling through the kernel: reversed winding on CLOSED cubes
# still hits (the ray exits through the far face, which culling now faces) —
# so the correct check is kernel-vs-brute agreement on the reversed scene,
# not "no hits" (round-4 note: the old ~0 expectation was a physics error).
out_bf = trace_closest_hit_tight(build_tight_scene(a, c, b), rays, packet=512)
inter_rev = ray_intersects_triangle(
    rays_b, jnp.asarray(a)[None], jnp.asarray(c)[None], jnp.asarray(b)[None])
t_bf_b = np.asarray(inter_rev.distance).min(axis=1)
hit_bf_k = np.isfinite(np.asarray(out_bf.t))
bf_agree = (np.isfinite(t_bf_b) == hit_bf_k).mean()
bf_hits = hit_bf_k.mean()
print(f"reversed-winding kernel vs brute mask agree: {bf_agree:.6f} "
      f"(hit fraction {bf_hits:.4f})")

# nearest kernel vs brute
from bvh_tpu.tri import point_triangle_distance_squared
pts = (centers[rng.integers(0, len(centers), 2048)]
       + rng.normal(scale=30.0, size=(2048, 3))).astype(np.float32)
sid_n, dist_n = nearest_tight(scene, jnp.asarray(pts), packet=512)
d2b = point_triangle_distance_squared(
    jnp.asarray(pts)[:, None, :], jnp.asarray(a)[None], jnp.asarray(b)[None],
    jnp.asarray(c)[None])
bd = np.sqrt(np.asarray(d2b).min(axis=1))
err = np.abs(np.asarray(dist_n) - bd)
print(f"nearest vs brute: max abs err {err.max():.3e}, "
      f"max rel {(err / np.maximum(bd, 1e-6)).max():.3e}")

ok = ok_sem and (not face_hit) and bf_agree == 1.0 and (err < 1e-2).all()
print("JUDGE VERIFY", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
