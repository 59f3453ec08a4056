"""Dynamic scene loop: quality-preserving per-frame updates.

The workflow the reference documents for ``Bvh::update_shapes``
(/root/reference/src/bvh/optimization.rs:304-315, README.md:192-247) —
build once, move a fraction of the shapes every frame, update instead of
rebuilding — expressed the bvh_tpu way:

  1. build the static scene ONCE on the host (best SAH quality),
  2. every frame, pass the full vertex arrays + the cumulative moved set
     to ``make_updater``'s jitted update: the moved lanes are masked out
     of the static part (its tree quality is untouched) and rebuilt on
     device into a small delta part,
  3. trace the chained (static, delta) scene; rebuild on host only when
     cumulative churn approaches the updater capacity.

Run: python examples/dynamic_scene.py [--cubes 1000] [--frames 5]
Prints per-frame update + trace timings and validates hits against the
moved geometry.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cubes", type=int, default=1000)  # 12k triangles
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--rays", type=int, default=1 << 16)
    ap.add_argument("--churn", type=float, default=0.02,
                    help="fraction of triangles moved per frame")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU + interpret mode (no TPU)")
    args = ap.parse_args()

    if args.cpu:
        # pin cpu BEFORE any backend use — probing for a TPU
        # (jax.default_backend()) hangs when the tunnel is unreachable
        jax.config.update("jax_platforms", "cpu")
        interpret = True
        # interpret-mode kernels run the packet loop in pure Python —
        # cap the workload so the demo finishes in seconds off-TPU
        args.cubes = min(args.cubes, 150)
        args.rays = min(args.rays, 1 << 12)
        args.frames = min(args.frames, 3)
    else:
        interpret = jax.default_backend() == "cpu"

    from bvh_tpu import Ray
    from bvh_tpu import testbase as tb
    from bvh_tpu.ops import build_tight_scene, make_updater
    from bvh_tpu.ops.trace import trace_closest_hit_chained

    a, b, c = (np.asarray(x) for x in tb.create_n_cubes(args.cubes))
    n = a.shape[0]
    per_frame = max(int(n * args.churn), 12)
    cap = per_frame * args.frames  # cumulative capacity before host rebuild

    t0 = time.perf_counter()
    scene = build_tight_scene(a, b, c)
    print(f"host build: {n} tris in {time.perf_counter() - t0:.3f}s")
    updater = make_updater(scene, max_moved=cap)

    centers = a.reshape(-1, 12, 3).mean(axis=1)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(centers), args.rays)
    offs = rng.normal(size=(args.rays, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 45.0).astype(np.float32)
    d = (centers[idx] + 0.1 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))

    moved_all = np.full(cap, -1, np.int32)
    n_moved = 0
    a2, b2, c2 = a.copy(), b.copy(), c.copy()
    for frame in range(args.frames):
        # move per_frame random triangles (whole cubes, like the reference's
        # randomly_transform_scene)
        mv = rng.choice(n, size=per_frame, replace=False).astype(np.int32)
        shift = rng.uniform(5, 25, size=(1, 3)).astype(np.float32)
        for arr in (a2, b2, c2):
            arr[mv] += shift
        moved_all[n_moved:n_moved + per_frame] = mv
        n_moved += per_frame

        t0 = time.perf_counter()
        chained = updater(jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2),
                          jnp.asarray(moved_all))
        hit = trace_closest_hit_chained(chained, rays, packet=1024,
                                        interpret=interpret)
        n_hits = int(jnp.isfinite(hit.t).sum())  # forces the result to host
        dt = time.perf_counter() - t0
        label = "compile+run" if frame == 0 else "run"
        print(f"frame {frame}: moved {n_moved}/{cap} cumulative, "
              f"{n_hits}/{args.rays} hits, {label} {dt:.3f}s")

    # sanity: the final frame agrees with a fresh host rebuild
    rebuilt = build_tight_scene(a2, b2, c2)
    from bvh_tpu.ops.trace import trace_closest_hit_tight
    want = trace_closest_hit_tight(rebuilt, rays, packet=1024,
                                   interpret=interpret)
    tg, tw = np.asarray(hit.t), np.asarray(want.t)
    agree = float((np.isfinite(tg) == np.isfinite(tw)).mean())
    print(f"updated-vs-rebuilt hit masks agree: {agree:.4f}")
    assert agree > 0.99
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
