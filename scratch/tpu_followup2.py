"""Follow-up 2: packet scaling past 8192; pack decomposition; sorted nearest.

Prior hardware results (random 120k, 2M rays): wide presort P8192 sweep
6.40 M rays/s (best), P4096 4.91, sort+gather prep 0.063 s (fenced).

Legs:
  1. P16384 sweep/nosweep (does the packet win keep going?)
  2. P8192 bits3 sweep
  3. prep: sort+gather+FULL PACK (slab+lmat) — isolates the pack transposes
  4. nearest sorted vs unsorted (the sort= fix), 1M points
  5. pure-JAX nearest_to baseline at 64k points (scaled/r)

Usage: timeout 3000 python scratch/tpu_followup2.py
NEVER run while pytest runs (1 host core).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

INTERP = os.environ.get("MB_INTERPRET", "0") == "1"
if INTERP:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (_pack_rays_tight, sort_rays_device,
                               trace_closest_hit_tight)

N_CUBES = int(os.environ.get("MB_CUBES", "10000"))
N_RAYS = int(os.environ.get("MB_RAYS", str(2 << 20)))
ITERS = int(os.environ.get("MB_ITERS", "4"))

print("device:", jax.devices()[0], flush=True)

a, b, c = tb.create_n_cubes(N_CUBES)
scene = build_tight_scene(a, b, c)
seed = tb.seed_state_after(N_CUBES)
origins, dirs = tb.create_rays(N_RAYS, seed=seed)
o_dev, d_dev = jnp.asarray(origins), jnp.asarray(dirs)


def bench(tag, fn, iters=ITERS, n=N_RAYS):
    try:
        fn()
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"RESULT {tag}: {n / best / 1e6:.3f} M rays/s ({best:.3f} s)",
              flush=True)
        return best
    except Exception:
        print(f"FAIL {tag}:", flush=True)
        traceback.print_exc()
        return None


def run(packet, sweep, bits=2):
    perm, inv = sort_rays_device(o_dev, d_dev, bits=bits)
    rays = Ray.create(o_dev[perm], d_dev[perm])
    out = trace_closest_hit_tight(scene, rays, packet=packet, sweep=sweep,
                                  wide=True, interpret=INTERP)
    t = out.t[inv]
    return float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))


bench("wide presort sweep P16384", lambda: run(16384, True))
bench("wide presort NOSWEEP P16384", lambda: run(16384, False))
bench("wide presort sweep P8192 bits3", lambda: run(8192, True, bits=3))


def run_pack(packet):
    perm, inv = sort_rays_device(o_dev, d_dev, bits=2)
    rays = Ray.create(o_dev[perm], d_dev[perm])
    _, _, slab, lmat = _pack_rays_tight(rays, packet, None)
    return float(jnp.sum(slab[:, :6]) + jnp.sum(lmat[:, :3])
                 + jnp.sum(inv))


bench("prep sort+gather+pack P8192", lambda: run_pack(8192))

# --- nearest: sorted (new default) vs unsorted, 1M pts ---
try:
    from bvh_tpu.ops.nearest import nearest_tight

    n_pts = 1 << 20
    pts = tb.create_rays(n_pts, seed=tb.seed_state_after(N_CUBES + 7))[0]
    pts_j = jnp.asarray(pts)

    def run_near(sort, packet=4096):
        tid, dist = nearest_tight(scene, pts_j, packet=packet,
                                  interpret=INTERP, sort=sort)
        return float(jnp.sum(jnp.where(jnp.isfinite(dist), dist, 0.0)))

    bench(f"nearest wide SORTED {n_pts}", lambda: run_near(True), n=n_pts)
    bench(f"nearest wide SORTED P8192 {n_pts}",
          lambda: run_near(True, 8192), n=n_pts)
    # correctness: sorted vs unsorted must agree exactly
    s1 = nearest_tight(scene, pts_j[:65536], sort=True, interpret=INTERP)
    s0 = nearest_tight(scene, pts_j[:65536], sort=False, interpret=INTERP)
    agree_d = float(jnp.max(jnp.abs(jnp.nan_to_num(s1[1] - s0[1], posinf=0.0))))
    agree_i = int(jnp.sum(s1[0] != s0[0]))
    print(f"CROSSCHECK nearest sorted vs unsorted: id mismatches {agree_i}, "
          f"max|dd| {agree_d:.3e}", flush=True)
    # fail loudly: a sort-path regression must gate the run, not scroll by
    assert agree_i == 0 and agree_d == 0.0, (
        f"nearest sorted-vs-unsorted CROSSCHECK FAILED: {agree_i} id "
        f"mismatches, max|dd|={agree_d:.3e}")
except Exception:
    print("FAIL nearest leg:", flush=True)
    traceback.print_exc()

# --- pure-JAX nearest_to baseline (64k pts; kernel target is >=10x this) ---
try:
    from bvh_tpu.bvh import build_sah, nearest_to_triangles

    mn, mx = tb.tri_aabbs(a, b, c)
    flat = build_sah(mn, mx)[0].to_device()
    n_small = 1 << 16
    pts_s = jnp.asarray(
        tb.create_rays(n_small, seed=tb.seed_state_after(N_CUBES + 7))[0])

    def run_pj():
        tid, d2 = nearest_to_triangles(flat, pts_s,
                                       jnp.asarray(a), jnp.asarray(b),
                                       jnp.asarray(c))
        return float(jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0)))

    bench(f"nearest pure-JAX {n_small}", run_pj, n=n_small)
except Exception:
    print("FAIL pure-JAX nearest leg:", flush=True)
    traceback.print_exc()

print("FOLLOWUP2 DONE", flush=True)
