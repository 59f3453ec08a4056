"""Master round-3 measurement pass (run when the TPU tunnel is back).

Measures, in order (each leg prints one tagged line; crash-safe per leg):
  1. wide group-walk vs entry/exit tight kernel (random 120k, A/B)
  2. perm-folded pack vs pre-sorted rays (prep cut, A/B)
  3. planner (subtree entry) on aimed workload vs plain seeding
  4. mask+delta updater quality at 1pct churn
  5. nearest kernel vs pure-JAX nearest_to
  6. ordered (K-closest) kernel throughput

Usage: timeout 3600 python scratch/tpu_master_bench.py 2>&1 | tee /tmp/master_bench.log
NEVER run while pytest runs (1 host core).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

INTERP = os.environ.get("MB_INTERPRET", "0") == "1"  # CPU smoke mode
if INTERP:
    jax.config.update("jax_platforms", "cpu")  # BEFORE bvh_tpu imports

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (make_planner, sort_rays_device,
                               trace_closest_hit_tight)

N_CUBES = int(os.environ.get("MB_CUBES", "10000"))
N_RAYS = int(os.environ.get("MB_RAYS", str(2 << 20)))
PACKET = int(os.environ.get("MB_PACKET", "4096"))
ITERS = int(os.environ.get("MB_ITERS", "4"))

print("device:", jax.devices()[0], flush=True)

a, b, c = tb.create_n_cubes(N_CUBES)
scene = build_tight_scene(a, b, c)
seed = tb.seed_state_after(N_CUBES)
origins, dirs = tb.create_rays(N_RAYS, seed=seed)
o_dev, d_dev = jnp.asarray(origins), jnp.asarray(dirs)
rays_u = Ray.create(o_dev, d_dev)


def bench(tag, fn, iters=ITERS):
    try:
        fn()  # compile + warmup
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"RESULT {tag}: {N_RAYS / best / 1e6:.3f} M rays/s ({best:.3f} s)",
              flush=True)
        return best
    except Exception:
        print(f"FAIL {tag}:", flush=True)
        traceback.print_exc()
        return None


def run_random(wide, perm_mode, sweep=True):
    perm, inv = sort_rays_device(o_dev, d_dev, bits=2)
    if perm_mode:
        out = trace_closest_hit_tight(scene, rays_u, packet=PACKET,
                                      sweep=sweep, wide=wide, perm=perm,
                                      interpret=INTERP)
    else:
        rays = Ray.create(o_dev[perm], d_dev[perm])
        out = trace_closest_hit_tight(scene, rays, packet=PACKET,
                                      sweep=sweep, wide=wide,
                                      interpret=INTERP)
    t = out.t[inv]
    return float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))


# correctness cross-check first: wide+perm vs narrow+presorted must agree
def crosscheck():
    perm, inv = sort_rays_device(o_dev, d_dev, bits=2)
    rays = Ray.create(o_dev[perm], d_dev[perm])
    t0 = trace_closest_hit_tight(scene, rays, packet=PACKET, wide=False,
                                 interpret=INTERP).t
    t1 = trace_closest_hit_tight(scene, rays_u, packet=PACKET, wide=True,
                                 perm=perm, interpret=INTERP).t
    n0, n1 = np.asarray(t0), np.asarray(t1)
    same = (np.isfinite(n0) == np.isfinite(n1)).mean()
    both = np.isfinite(n0) & np.isfinite(n1)
    dt = np.abs(n0[both] - n1[both]).max() if both.any() else 0.0
    print(f"CROSSCHECK wide+perm vs narrow+presorted: mask agree {same:.6f}, "
          f"max|dt| {dt:.3e}", flush=True)


crosscheck()

# --- leg 1+2: random headline grid {narrow,wide} x {presorted,perm} ---
for wide in (False, True):
    for perm_mode in (False, True):
        tag = f"random {'wide' if wide else 'narrow'} {'perm' if perm_mode else 'presort'}"
        bench(tag, lambda w=wide, p=perm_mode: run_random(w, p))
# sweep A/B on the wide path: the pre-pass walks the coarse table with the
# SERIAL entry/exit chain — against the wide main kernel's ~9x fewer
# iterations, its round-2 +24% may have inverted
bench("random wide perm NOSWEEP",
      lambda: run_random(True, True, sweep=False))

# --- leg 3: aimed workload, planner vs no planner ---
n_aimed = min(N_RAYS, 1 << 20)
centers = a.reshape(-1, 12, 3).mean(axis=1)
idx = np.resize(np.arange(len(centers)), n_aimed)
order = np.argsort(idx, kind="stable")
idx = idx[order]
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_aimed, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
aim_o = (centers[idx] + offs * 50.0).astype(np.float32)
aim_d = (centers[idx] + 0.1 - aim_o).astype(np.float32)
ao_j, ad_j = jnp.asarray(aim_o), jnp.asarray(aim_d)
perm_a, _ = sort_rays_device(ao_j, ad_j, mode="morton")
aimed = Ray.create(ao_j[perm_a], ad_j[perm_a])  # morton: planner engages
aimed_unsorted = Ray.create(ao_j, ad_j)

planner = make_planner(scene, packet=PACKET, interpret=INTERP)


def run_aimed_planned():
    hints_a, start_a = planner(aimed)
    out = trace_closest_hit_tight(scene, aimed, packet=PACKET,
                                  hints=hints_a, start_g=start_a,
                                  interpret=INTERP)
    return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))


def run_aimed_hints_only():
    hints_a, start_a = planner(aimed)
    out = trace_closest_hit_tight(scene, aimed, packet=PACKET, hints=hints_a,
                                  interpret=INTERP)
    return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))


def run_aimed_plain():
    out = trace_closest_hit_tight(scene, aimed, packet=PACKET,
                                  interpret=INTERP)
    return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))


def run_aimed_unsorted():
    out = trace_closest_hit_tight(scene, aimed_unsorted, packet=PACKET,
                                  interpret=INTERP)
    return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))


def run_aimed_planned_slot0():
    hints_a, start_a = planner(aimed)
    s0 = start_a.at[:, 1].set(-1)  # disable the two-entry tail fix
    out = trace_closest_hit_tight(scene, aimed, packet=PACKET,
                                  hints=hints_a, start_g=s0,
                                  interpret=INTERP)
    return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))


saved, NR = N_RAYS, n_aimed
N_RAYS = NR
bench("aimed planned (morton+hints+start2)", run_aimed_planned)
bench("aimed planned slot0-only", run_aimed_planned_slot0)
bench("aimed hints only (morton)", run_aimed_hints_only)
bench("aimed plain (morton)", run_aimed_plain)
bench("aimed plain (cube-order)", run_aimed_unsorted)
N_RAYS = saved

# --- leg 4: updater quality at 1pct ---
try:
    from bvh_tpu.ops import make_updater
    from bvh_tpu.ops.trace import trace_closest_hit_chained

    amount = int(len(a) * 0.01)
    am, bm, cm, moved = tb.randomly_transform_scene(a, b, c, amount=amount,
                                                    seed=13)
    amj, bmj, cmj = jnp.asarray(am), jnp.asarray(bm), jnp.asarray(cm)
    updater = make_updater(scene, max_moved=amount)
    sc_u = updater(amj, bmj, cmj, jnp.asarray(moved, jnp.int32)[:amount])
    sc_r = build_tight_scene(am, bm, cm)

    def run_q(sc):
        perm, inv = sort_rays_device(o_dev, d_dev, bits=2)
        if hasattr(sc, "parts"):
            out = trace_closest_hit_chained(sc, rays_u, packet=PACKET,
                                            sweep=True, perm=perm,
                                            interpret=INTERP)
        else:
            out = trace_closest_hit_tight(sc, rays_u, packet=PACKET,
                                          sweep=True, perm=perm,
                                          interpret=INTERP)
        t = out.t[inv]
        return float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))

    bench("1pct update (mask+delta)", lambda: run_q(sc_u))
    bench("1pct host rebuild", lambda: run_q(sc_r))
    # topology-fixed device refit now keeps the wide tables — third cell
    from bvh_tpu.ops.device_build import make_refitter

    sc_f = make_refitter(scene)(amj, bmj, cmj)
    bench("1pct refit (wide kept)", lambda: run_q(sc_f))
except Exception:
    print("FAIL updater leg:", flush=True)
    traceback.print_exc()

# --- leg 5: nearest kernel ---
try:
    from bvh_tpu.ops.nearest import nearest_tight

    n_pts = min(N_RAYS, 1 << 20)
    pts = tb.create_rays(n_pts, seed=tb.seed_state_after(N_CUBES + 7))[0]
    pts_j = jnp.asarray(pts)

    def run_near():
        tid, dist = nearest_tight(scene, pts_j, packet=PACKET,
                                  interpret=INTERP)
        return float(jnp.sum(jnp.where(jnp.isfinite(dist), dist, 0.0)))

    def run_near_ee():  # entry/exit A/B (wide is the default now)
        tid, dist = nearest_tight(scene, pts_j, packet=PACKET,
                                  interpret=INTERP, wide=False)
        return float(jnp.sum(jnp.where(jnp.isfinite(dist), dist, 0.0)))

    saved = N_RAYS
    N_RAYS = n_pts
    bench(f"nearest kernel wide {n_pts} pts", run_near)
    bench(f"nearest kernel entry/exit {n_pts} pts", run_near_ee)
    N_RAYS = saved
except Exception:
    print("FAIL nearest leg:", flush=True)
    traceback.print_exc()

# --- leg 6: ordered (K closest) ---
try:
    from bvh_tpu.ops.ordered import trace_k_closest

    def run_ord():
        t_k, sid_k, cnt = trace_k_closest(scene, aimed, k=4, packet=PACKET,
                                          interpret=INTERP)
        return float(jnp.sum(jnp.where(jnp.isfinite(t_k), t_k, 0.0)))

    saved = N_RAYS
    N_RAYS = n_aimed
    bench("ordered k=4 aimed", run_ord)
    N_RAYS = saved
except Exception:
    print("FAIL ordered leg:", flush=True)
    traceback.print_exc()

print("MASTER BENCH DONE", flush=True)
