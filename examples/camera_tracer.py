"""Per-frame rendering with the ONE-jit tracer (`ops.make_tracer`).

The per-call API (`trace_closest_hit_tight`) dispatches sort, pack, walk
and un-permute as separate programs — fine inside a larger jit, but a
render loop wants ONE compiled program per scene. `make_tracer` closes
over the scene's device tables and fuses the whole pipeline; on a TPU v5e
the 260k-triangle camera workload runs at ~15 M rays/s through it
(bench.py `camera_decomposition`).

Two tracers are built here:

* camera tracer (`sort=None`): the 32x32-tile camera rays are already
  coherent — no in-program sort.
* free-ray tracer (`sort="octmorton"`, `plan="key"`): arbitrary ray
  batches get the octant-major/Morton-cell coherence sort and the free
  key-planned subtree entry, and results come back in input order.

Run: python examples/camera_tracer.py [--cpu] [--size 256] [--out depth.pgm]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (kernels in interpret mode)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="camera_depth.pgm")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bvh_tpu import testbase as tb
    from bvh_tpu.diff.camera import camera_rays
    from bvh_tpu.ops import build_tight_scene, make_tracer

    interpret = jax.devices()[0].platform != "tpu"

    a, b, c = tb.create_dense_mesh()
    t0 = time.perf_counter()
    scene = build_tight_scene(a, b, c, leaf_size=128)
    print(f"scene: {a.shape[0]} tris, host build "
          f"{1e3 * (time.perf_counter() - t0):.1f} ms")

    S = args.size
    cam = camera_rays(np.array([0.0, 60.0, -120.0], np.float32),
                      np.array([0.0, 0.0, 0.0], np.float32),
                      np.array([0.0, 1.0, 0.0], np.float32), 55.0, S, S)
    # 32x32 tiles -> packet-coherent ray order (undone for the image below)
    T = 32 if S % 32 == 0 else 8
    o = np.asarray(cam.origin).reshape(S // T, T, S // T, T, 3)
    o = o.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
    d = np.asarray(cam.direction).reshape(S // T, T, S // T, T, 3)
    d = d.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    tracer = make_tracer(scene, packet=4096 if S >= 64 else 1024,
                         sweep=False, sort=None, interpret=interpret)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    out = tracer(oj, dj)  # compile + warmup
    t0 = time.perf_counter()
    out = tracer(oj, dj)
    t_host = np.asarray(out.t)  # forces the result
    dt = time.perf_counter() - t0
    hit = np.isfinite(t_host)
    print(f"camera tracer: {S * S} rays in {1e3 * dt:.1f} ms "
          f"({S * S / dt / 1e6:.2f} M rays/s), hit {hit.mean():.3f}")

    # depth -> PGM (tile order undone back to scanlines)
    depth = np.where(hit, t_host, np.nanmax(np.where(hit, t_host, np.nan)))
    img = depth.reshape(S // T, S // T, T, T).transpose(0, 2, 1, 3)
    img = img.reshape(S, S)
    lo, hi = img.min(), img.max()
    gray = (255 * (1.0 - (img - lo) / max(hi - lo, 1e-6))).astype(np.uint8)
    with open(args.out, "wb") as f:
        f.write(f"P5\n{S} {S}\n255\n".encode())
        f.write(gray.tobytes())
    print(f"wrote {args.out}")

    # free-ray tracer: arbitrary batch, results in input order
    rng = np.random.default_rng(0)
    n = 4096
    idx = rng.integers(0, a.shape[0], n)
    ro = (a[idx] + rng.normal(size=(n, 3)).astype(np.float32) * 40).astype(np.float32)
    rd = (a[idx] + 0.1 - ro).astype(np.float32)
    free = make_tracer(scene, packet=1024, sweep=False, sort="octmorton",
                       plan="key", interpret=interpret)
    hits = free(jnp.asarray(ro), jnp.asarray(rd))
    print(f"free-ray tracer: {n} rays, "
          f"hit {np.isfinite(np.asarray(hits.t)).mean():.3f} "
          f"(results in input order)")


if __name__ == "__main__":
    main()
