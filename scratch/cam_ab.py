"""A/B the camera (Sponza-class) leg: per-call public API vs make_tracer.

Round-4 verdict item 2: plain camera 2.22 M rays/s vs 6.43 M for the same
trace inside the jitted fwd+bwd leg — the per-call path pays repeated
scene-table transfers + multi-dispatch. Legs:

  percall-1024   bench.py's r4 configuration (trace_closest_hit_tight)
  tracer-1024    make_tracer(sort=None), one jitted program
  tracer-8192    same at P8192 (8 camera tiles per packet)
  tracer-4096    same at P4096
  headline-*     the random 120k workload: per-call run() vs make_tracer

Run: python scratch/cam_ab.py   (NOT while pytest/bench runs)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (make_tracer, sort_rays_device,
                               trace_closest_hit_tight)


def bench(label, fn, iters=5):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def fence(t):
    return float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))


# ---- camera workload (bench.py camera_dense leg) ----
from bvh_tpu.diff.camera import camera_rays

ad, bd, cd = tb.create_dense_mesh()
scene_d = build_tight_scene(ad, bd, cd, leaf_size=128)
Wd = Hd = 1024
cam = camera_rays(np.array([0.0, 60.0, -120.0], np.float32),
                  np.array([0.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                  55.0, Wd, Hd)
oc = np.asarray(cam.origin).reshape(Hd // 32, 32, Wd // 32, 32, 3)
oc = oc.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
dc = np.asarray(cam.direction).reshape(Hd // 32, 32, Wd // 32, 32, 3)
dc = dc.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
cam_tiled = Ray.create(jnp.asarray(oc), jnp.asarray(dc))
oc_j, dc_j = jnp.asarray(oc), jnp.asarray(dc)
n_cam = Wd * Hd

ref_t = None
results = {}


def report(label, best, t_arr):
    global ref_t
    print(f"{label:22s} {best:.4f}s  {n_cam/best/1e6:7.2f} M rays/s", flush=True)
    results[label] = n_cam / best
    ta = np.asarray(t_arr)
    if ref_t is None:
        ref_t = ta
    else:
        bad = (~(np.isclose(ta, ref_t) | (np.isinf(ta) & np.isinf(ref_t)))).sum()
        if bad:
            print(f"  !! {label}: {bad} t mismatches vs percall", flush=True)


out0 = trace_closest_hit_tight(scene_d, cam_tiled, packet=1024)
b = bench("percall-1024",
          lambda: fence(trace_closest_hit_tight(scene_d, cam_tiled,
                                                packet=1024).t))
report("percall-1024", b, out0.t)

for p in (1024, 4096, 8192):
    tr = make_tracer(scene_d, packet=p, sweep=False, sort=None)
    out = tr(oc_j, dc_j)
    b = bench(f"tracer-{p}", lambda tr=tr: fence(tr(oc_j, dc_j).t))
    report(f"tracer-{p}", b, out.t)

# ---- headline workload (random 120k) ----
a, b_, c = tb.create_n_cubes(10000)
scene = build_tight_scene(a, b_, c)
seed = tb.seed_state_after(10000)
origins, dirs = tb.create_rays(2 << 20, seed=seed)
o_dev, d_dev = jnp.asarray(origins), jnp.asarray(dirs)
n_rays = 2 << 20


def run_percall():
    perm, inv = sort_rays_device(o_dev, d_dev, bits=2)
    rays_s = Ray.create(o_dev[perm], d_dev[perm])
    out = trace_closest_hit_tight(scene, rays_s, packet=8192, sweep=True)
    t = out.t[inv]
    return fence(t), t


_, t_pc = run_percall()
bb = bench("headline-percall", lambda: run_percall()[0])
print(f"{'headline-percall':22s} {bb:.4f}s  {n_rays/bb/1e6:7.2f} M rays/s",
      flush=True)

tr_h = make_tracer(scene, packet=8192, sweep=True, sort="octant", bits=2)
out_h = tr_h(o_dev, d_dev)
bb2 = bench("headline-tracer", lambda: fence(tr_h(o_dev, d_dev).t))
print(f"{'headline-tracer':22s} {bb2:.4f}s  {n_rays/bb2/1e6:7.2f} M rays/s",
      flush=True)
tph = np.asarray(out_h.t)
tpc = np.asarray(t_pc)
bad = (~(np.isclose(tph, tpc) | (np.isinf(tph) & np.isinf(tpc)))).sum()
print(f"headline crosscheck: {bad} t mismatches", flush=True)
print("DONE", flush=True)
