"""Multi-bounce path tracer on the bvh_tpu kernels.

Demonstrates the full tracing API working together on one TPU:

* primary + bounce rays: ``trace_closest_hit_tight`` (closest hit, exact
  u/v/t recompute on the winner via ``tris=``),
* shadow rays: ``trace_any_hit_tight`` with a per-ray ``t_max`` at the
  light distance (the occlusion query the reference expresses as
  ``traverse`` + manual intersection, src/bvh/bvh_impl.rs:350-378),
* Lambertian bounces with a deterministic per-pixel RNG.

Run: python examples/pathtrace.py [--size 256] [--bounces 2] [--out img.ppm]
Writes a PPM image and prints per-stage ray counts and rates.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops import build_tight_scene, trace_any_hit_tight, trace_closest_hit_tight


def make_scene():
    """A heightfield floor plus a few cube 'sculptures' standing on it."""
    fa, fb, fc = tb.create_dense_mesh(res=96, extent=24.0)  # floor
    cubes = []
    rng = np.random.default_rng(7)
    for k in range(6):
        ca, cb, cc = tb.create_n_cubes(1, (np.full(3, -0.5, np.float32),
                                           np.full(3, 0.5, np.float32)), seed=k)
        s = 1.5 + rng.uniform(0, 1.5)
        off = np.float32([rng.uniform(-14, 14), 9.0 + rng.uniform(0, 3), rng.uniform(-14, 14)])
        cubes.append((ca * s + off, cb * s + off, cc * s + off))
    a = np.concatenate([fa] + [x[0] for x in cubes])
    b = np.concatenate([fb] + [x[1] for x in cubes])
    c = np.concatenate([fc] + [x[2] for x in cubes])
    return a.astype(np.float32), b.astype(np.float32), c.astype(np.float32)


def camera_rays(size: int):
    """Pinhole camera looking down at the scene, tiled 8x128-coherent."""
    fov = 0.7
    eye = np.float32([0.0, 18.0, 26.0])
    look = np.float32([0.0, 0.0, 0.0])
    fwd = (look - eye) / np.linalg.norm(look - eye)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    ys, xs = np.meshgrid(np.linspace(1, -1, size), np.linspace(-1, 1, size), indexing="ij")
    d = (fwd[None, None] + fov * (xs[..., None] * right[None, None]
                                  + ys[..., None] * up[None, None]))
    d = d.reshape(-1, 3).astype(np.float32)
    o = np.tile(eye, (size * size, 1)).astype(np.float32)
    return o, d


def normals_of(a, b, c, sid):
    n = np.cross(b[sid] - a[sid], c[sid] - a[sid])
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--out", default="pathtrace.ppm")
    ap.add_argument("--interpret", action="store_true", help="off-TPU run")
    args = ap.parse_args()

    a, b, c = make_scene()
    print(f"scene: {a.shape[0]} triangles")
    t0 = time.perf_counter()
    scene = build_tight_scene(a, b, c)
    print(f"build: {(time.perf_counter()-t0)*1e3:.0f} ms "
          f"(W={scene.width}, {scene.num_nodes} upper nodes)")

    light_pos = np.float32([12.0, 22.0, 8.0])
    light_col = np.float32([1.0, 0.96, 0.9]) * 1.4
    sky = np.float32([0.45, 0.6, 0.85])
    albedo = np.float32([0.75, 0.72, 0.68])

    o, d = camera_rays(args.size)
    npx = o.shape[0]
    color = np.zeros((npx, 3), np.float32)
    throughput = np.ones((npx, 3), np.float32)
    alive = np.ones(npx, bool)
    rng = np.random.default_rng(0)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    total_rays = 0
    t0 = time.perf_counter()
    for bounce in range(args.bounces + 1):
        rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
        hit = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj),
                                      packet=2048, interpret=args.interpret)
        total_rays += npx
        t = np.asarray(hit.t)
        sid = np.asarray(hit.shape_id)
        miss = ~np.isfinite(t) & alive
        color[miss] += throughput[miss] * sky
        hitm = np.isfinite(t) & alive
        if not hitm.any():
            break

        t_safe = np.where(np.isfinite(t), t, 0.0)
        p = o + d / np.linalg.norm(d, axis=-1, keepdims=True) * t_safe[:, None]
        nrm = normals_of(a, b, c, np.maximum(sid, 0))
        # face the ray
        flip = (nrm * d).sum(-1) > 0
        nrm[flip] = -nrm[flip]

        # next-event estimation: shadow ray to the point light
        to_l = light_pos[None] - p
        dist_l = np.linalg.norm(to_l, axis=-1)
        wl = to_l / np.maximum(dist_l[:, None], 1e-20)
        sh_o = p + nrm * 1e-3
        sh_rays = Ray.create(jnp.asarray(sh_o.astype(np.float32)),
                             jnp.asarray(wl.astype(np.float32)))
        occluded = np.asarray(trace_any_hit_tight(
            scene, sh_rays, t_max=jnp.asarray((dist_l * 0.999).astype(np.float32)),
            packet=2048, interpret=args.interpret))
        total_rays += npx
        ndl = np.maximum((nrm * wl).sum(-1), 0.0)
        lit = hitm & ~occluded
        falloff = 500.0 / np.maximum(dist_l, 1.0) ** 2
        color[lit] += (throughput[lit] * albedo[None] * light_col[None]
                       * (ndl[lit] * falloff[lit])[:, None])

        # Lambertian bounce
        alive = hitm
        throughput[alive] *= albedo
        u = rng.normal(size=(npx, 3)).astype(np.float32)
        u /= np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-20)
        u = np.where((u * nrm).sum(-1, keepdims=True) < 0, -u, u)
        o = (p + nrm * 1e-3).astype(np.float32)
        d = (nrm + u).astype(np.float32)
        d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-20)

    dt = time.perf_counter() - t0
    print(f"traced {total_rays/1e6:.2f} M rays in {dt:.2f}s "
          f"({total_rays/dt/1e6:.2f} M rays/s incl. host shading)")

    img = np.clip(color.reshape(args.size, args.size, 3), 0, 1)
    img8 = (np.sqrt(img) * 255).astype(np.uint8)  # gamma 2.0
    with open(args.out, "wb") as f:
        f.write(f"P6\n{args.size} {args.size}\n255\n".encode())
        f.write(img8.tobytes())
    print(f"wrote {args.out}  (mean luminance {img.mean():.3f})")


if __name__ == "__main__":
    main()
