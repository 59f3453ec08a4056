"""Multi-bounce path tracer on the bvh_tpu kernels.

Demonstrates the full tracing API working together on one TPU via the
FUSED wavefront renderer (``bvh_tpu.render.make_pathtracer``): closest-hit
waves, NEE shadow waves (``trace_any_hit_tight`` with per-ray ``t_max`` —
the occlusion query the reference expresses as ``traverse`` + manual
intersection, src/bvh/bvh_impl.rs:350-378) and Lambertian bounces all run
as ONE jitted device program; the host dispatches once per frame.

Run: python examples/pathtrace.py [--size 256] [--bounces 2] [--out img.ppm]
Writes a PPM image and prints ray counts and rates.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import jax

from bvh_tpu import testbase as tb
from bvh_tpu.ops import build_tight_scene
from bvh_tpu.render import make_pathtracer


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--out", default="pathtrace.ppm")
    ap.add_argument("--interpret", action="store_true",
                    help="off-TPU run: pin the cpu backend (probing for a "
                         "TPU can hang when none is reachable) and shrink "
                         "the image for interpret-mode kernel speed")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        args.size = min(args.size, 64)

    a, b, c = make_scene()
    print(f"scene: {a.shape[0]} triangles")
    t0 = time.perf_counter()
    scene = build_tight_scene(a, b, c)
    print(f"build: {(time.perf_counter()-t0)*1e3:.0f} ms "
          f"(W={scene.width}, {scene.num_nodes} upper nodes)")

    o, d = camera_rays(args.size)
    npx = o.shape[0]
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    tracer = make_pathtracer(scene, (aj, bj, cj), bounces=args.bounces,
                             packet=2048, interpret=args.interpret)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    key = jax.random.key(0)

    color = tracer(oj, dj, key)  # compile + warmup
    _ = float(jnp.sum(color))
    t0 = time.perf_counter()
    color = tracer(oj, dj, key)
    _ = float(jnp.sum(color))  # fence (block_until_ready lies on axon)
    total_rays = npx * 2 * (args.bounces + 1)
    dt = time.perf_counter() - t0
    print(f"traced {total_rays/1e6:.2f} M rays in {dt:.2f}s "
          f"({total_rays/dt/1e6:.2f} M rays/s, fused wavefront)")

    img = np.clip(np.asarray(color).reshape(args.size, args.size, 3), 0, 1)
    img8 = (np.sqrt(img) * 255).astype(np.uint8)  # gamma 2.0
    with open(args.out, "wb") as f:
        f.write(f"P6\n{args.size} {args.size}\n255\n".encode())
        f.write(img8.tobytes())
    print(f"wrote {args.out}  (mean luminance {img.mean():.3f})")


if __name__ == "__main__":
    main()
