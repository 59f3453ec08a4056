"""Real-mesh end-to-end demo: OBJ file -> BVH -> camera render -> gradients.

The reference validates against a Sponza .obj loaded through obj-rs
(``src/testbase.rs:618-634``); its sponza.obj is a stripped blob in this
checkout, so this demo generates a nontrivial architectural OBJ (colonnade:
floor slab, columns with octagonal shafts, lintel beams — quads and n-gons
that exercise the loader's fan triangulation), loads it through the real
``io/obj.py`` parser, and runs the full pipeline on it:

  OBJ text -> load_obj_triangles -> build_tight_scene -> camera closest-hit
  render (Pallas kernel) -> depth image PPM -> one vertex-gradient step
  through the differentiable path.

Run: python examples/obj_render.py [--size 512] [--out obj_render.ppm]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def generate_colonnade_obj(path: str, n_cols: int = 8, sides: int = 8) -> None:
    """Writes a colonnade scene as OBJ text (quads + n-gon caps)."""
    verts: list[tuple[float, float, float]] = []
    faces: list[list[int]] = []

    def v(x, y, z):
        verts.append((x, y, z))
        return len(verts)

    def box(x0, y0, z0, x1, y1, z1):
        i = [v(x0, y0, z0), v(x1, y0, z0), v(x1, y1, z0), v(x0, y1, z0),
             v(x0, y0, z1), v(x1, y0, z1), v(x1, y1, z1), v(x0, y1, z1)]
        faces.extend([[i[0], i[1], i[2], i[3]], [i[5], i[4], i[7], i[6]],
                      [i[4], i[0], i[3], i[7]], [i[1], i[5], i[6], i[2]],
                      [i[3], i[2], i[6], i[7]], [i[4], i[5], i[1], i[0]]])

    def column(cx, cz, r, h):
        lo = [v(cx + r * math.cos(2 * math.pi * k / sides),
                0.0,
                cz + r * math.sin(2 * math.pi * k / sides)) for k in range(sides)]
        hi = [v(cx + r * math.cos(2 * math.pi * k / sides),
                h,
                cz + r * math.sin(2 * math.pi * k / sides)) for k in range(sides)]
        for k in range(sides):
            k2 = (k + 1) % sides
            faces.append([lo[k], lo[k2], hi[k2], hi[k]])
        faces.append(list(reversed(lo)))  # n-gon caps: fan-triangulated
        faces.append(hi)

    half = n_cols * 2.0
    box(-half - 2, -0.5, -6.0, half + 2, 0.0, 6.0)  # floor slab
    for i in range(n_cols):
        x = -half + 1.5 + i * 4.0
        column(x, -4.0, 0.6, 7.0)
        column(x, 4.0, 0.6, 7.0)
    box(-half - 1, 7.0, -5.0, half + 1, 7.8, -3.0)  # lintels
    box(-half - 1, 7.0, 3.0, half + 1, 7.8, 5.0)

    with open(path, "w") as fh:
        fh.write("# generated colonnade scene (see examples/obj_render.py)\n")
        for x, y, z in verts:
            fh.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
        for f in faces:
            fh.write("f " + " ".join(str(i) for i in f) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="obj_render.ppm")
    ap.add_argument("--obj", default=None, help="path to an .obj (generated if absent)")
    ap.add_argument("--interpret", action="store_true",
                    help="off-TPU run: pin the cpu backend (probing for a "
                         "TPU can hang when none is reachable) and shrink "
                         "the image for interpret-mode kernel speed")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        args.size = min(args.size, 64)

    from bvh_tpu.diff import render_depth_fast
    from bvh_tpu.diff.camera import camera_rays
    from bvh_tpu.io.obj import load_obj_triangles
    from bvh_tpu.ops import build_tight_scene

    obj_path = args.obj
    if obj_path is None:
        obj_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "colonnade.obj")
        if not os.path.exists(obj_path):
            generate_colonnade_obj(obj_path)
            print(f"generated {obj_path}")

    a, b, c = load_obj_triangles(obj_path)
    print(f"loaded {obj_path}: {a.shape[0]} triangles")

    t0 = time.perf_counter()
    scene = build_tight_scene(a, b, c)
    print(f"build: {(time.perf_counter() - t0) * 1e3:.0f} ms "
          f"(W={scene.width}, {scene.num_nodes} upper nodes)")

    cam = camera_rays(np.float32([0.0, 9.0, 16.0]), np.float32([0.0, 2.5, 0.0]),
                      np.float32([0.0, 1.0, 0.0]), 55.0, args.size, args.size)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    def render(av, bv, cv):
        depth, hit = render_depth_fast(scene, cam, av, bv, cv,
                                       background=40.0, packet=2048,
                                       interpret=args.interpret)
        return depth, hit

    depth, hit = render(aj, bj, cj)
    hf = float(jnp.mean(hit.astype(jnp.float32)))
    t0 = time.perf_counter()
    depth, hit = render(aj, bj, cj)
    _ = float(jnp.sum(depth))
    dt = time.perf_counter() - t0
    print(f"render {args.size}x{args.size}: {dt * 1e3:.0f} ms "
          f"({args.size * args.size / dt / 1e6:.2f} M rays/s, hit {hf:.1%})")

    # one differentiable step: pull all hits 0.1 closer to the camera
    target = jnp.where(hit, depth - 0.1, depth)

    def loss(av, bv, cv):
        d, h = render(av, bv, cv)
        return jnp.sum(jnp.where(h, (d - target) ** 2, 0.0))

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(aj, bj, cj)
    gnorm = float(sum(jnp.sum(g * g) for g in grads)) ** 0.5
    print(f"gradient step: loss={float(val):.4f} |grad|={gnorm:.4f}")

    img = np.asarray(depth).reshape(args.size, args.size)
    lo, hi = img.min(), img.max()
    img8 = (255 * (1.0 - (img - lo) / max(hi - lo, 1e-6))).astype(np.uint8)
    with open(args.out, "wb") as fh:
        fh.write(f"P5\n{args.size} {args.size}\n255\n".encode())
        fh.write(img8.tobytes())
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
