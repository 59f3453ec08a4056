"""Nearest-neighbor point queries: the reference's ``nearest_to`` workflow.

Builds a scene, fires a batch of query points through the kernel-path
nearest search (group-walk broadphase + MXU point-triangle narrowphase),
and validates a sample against brute force. Shows all three tiers:

  1. ``ops.nearest_tight``    — single-table kernel path (fastest)
  2. ``ops.nearest_chained``  — beyond-one-SMEM-table scenes
  3. ``bvh.nearest_to_triangles`` — pure-JAX tier (any D, f32/f64, CPU)

Reference analogs: ``FlatBvh::nearest_to`` (src/flat_bvh.rs:513-562) and
``Bvh::nearest_to`` (src/bvh/bvh_impl.rs:221-238).

Run: python examples/nearest_query.py [--cubes 1000] [--points 65536]
     (--cpu for off-TPU interpret mode)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--cubes", type=int, default=1000)
    ap.add_argument("--points", type=int, default=1 << 16)
    ap.add_argument("--radius", type=float, default=None,
                    help="optional search radius (d_max)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU + interpret mode (no TPU)")
    args = ap.parse_args()

    if args.cpu:
        # pin cpu BEFORE any backend use — probing for a TPU hangs when
        # the tunnel is unreachable
        jax.config.update("jax_platforms", "cpu")
        interpret = True
        args.cubes = min(args.cubes, 150)
        args.points = min(args.points, 1 << 12)
    else:
        interpret = jax.default_backend() == "cpu"

    import jax.numpy as jnp

    from bvh_tpu import testbase as tb
    from bvh_tpu.bvh import build_sah, nearest_to_triangles
    from bvh_tpu.ops import build_tight_scene, nearest_tight
    from bvh_tpu.tri import point_triangle_distance_squared

    a, b, c = (np.asarray(x) for x in tb.create_n_cubes(args.cubes))
    print(f"scene: {a.shape[0]} triangles")

    t0 = time.perf_counter()
    scene = build_tight_scene(a, b, c)
    print(f"build: {(time.perf_counter() - t0) * 1e3:.0f} ms "
          f"(W={scene.width}, wide={'yes' if scene.gnodes is not None else 'no'})")

    # query points scattered around the geometry
    rng = np.random.default_rng(0)
    cen = (a + b + c) / 3.0
    idx = rng.integers(0, len(cen), args.points)
    pts = (cen[idx]
           + rng.normal(scale=15.0, size=(args.points, 3))).astype(np.float32)
    pts_j = jnp.asarray(pts)

    def run():
        sid, dist = nearest_tight(scene, pts_j, packet=2048,
                                  d_max=args.radius, interpret=interpret)
        return sid, dist, float(jnp.sum(jnp.where(jnp.isfinite(dist),
                                                  dist, 0.0)))

    sid, dist, _ = run()  # compile + warmup
    t0 = time.perf_counter()
    sid, dist, _ = run()
    dt = time.perf_counter() - t0
    sid, dist = np.asarray(sid), np.asarray(dist)
    found = sid >= 0
    print(f"kernel nearest: {args.points} points in {dt * 1e3:.0f} ms "
          f"({args.points / dt / 1e6:.2f} M queries/s), "
          f"{found.sum()} found, mean distance {dist[found].mean():.3f}")

    # validate a sample against brute force
    k = min(256, args.points)
    d2 = np.asarray(point_triangle_distance_squared(
        pts_j[:k, None, :], jnp.asarray(a)[None], jnp.asarray(b)[None],
        jnp.asarray(c)[None]))
    bd = np.sqrt(d2.min(axis=1))
    if args.radius is not None:
        bd = np.where(bd < args.radius, bd, np.inf)
    ok = np.allclose(np.where(np.isfinite(bd), dist[:k], 0),
                     np.where(np.isfinite(bd), bd, 0), rtol=1e-4, atol=1e-2)
    print(f"brute-force validation on {k} points: {'OK' if ok else 'MISMATCH'}")
    assert ok

    # pure-JAX tier (same answers, any dtype/dimension, runs anywhere)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat = build_sah(mn, mx)[0].to_device()
    ids2, dist2 = nearest_to_triangles(flat, pts_j[:k], jnp.asarray(a),
                                       jnp.asarray(b), jnp.asarray(c))
    assert np.allclose(np.asarray(dist2), np.sqrt(d2.min(axis=1)),
                       rtol=1e-4, atol=1e-2)
    print("pure-JAX tier agrees")


if __name__ == "__main__":
    main()
