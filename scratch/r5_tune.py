"""Round-5 leg tuning: headline sweep on/off x percall/tracer; aimed leg
percall vs tracer vs tracer+key-plan. Picks bench.py's defaults.

Run: python scratch/r5_tune.py   (NOT while pytest/bench runs)
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


def fence(t):
    return float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))


def bench(label, fn, n_rays, iters=4):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best:.4f}s  {n_rays/best/1e6:7.2f} M rays/s",
          flush=True)
    return best


a, b, c = tb.create_n_cubes(10000)
scene = build_tight_scene(a, b, c)
seed = tb.seed_state_after(10000)
o, d = tb.create_rays(2 << 20, seed=seed)
oj, dj = jnp.asarray(o), jnp.asarray(d)
N = 2 << 20

results = {}


def percall(sweep):
    perm, inv = sort_rays_device(oj, dj, bits=2)
    rays_s = Ray.create(oj[perm], dj[perm])
    out = trace_closest_hit_tight(scene, rays_s, packet=8192, sweep=sweep)
    return fence(out.t[inv])


for sweep in (True, False):
    bench(f"headline-percall sweep={sweep}", lambda s=sweep: percall(s), N)
for sweep in (True, False):
    tr = make_tracer(scene, packet=8192, sweep=sweep, sort="octant", bits=2)
    bench(f"headline-tracer  sweep={sweep}",
          lambda tr=tr: fence(tr(oj, dj).t), N)

# ---- aimed all-hit leg ----
n_aimed = 1 << 20
centers = a.reshape(-1, 12, 3).mean(axis=1)
idx = np.resize(np.arange(len(centers)), n_aimed)
order = np.argsort(idx, kind="stable")
idx = idx[order]
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_aimed, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
aim_o = (centers[idx] + offs * 50.0).astype(np.float32)
aim_d = (centers[idx] + 0.1 - aim_o).astype(np.float32)
ao, ad = jnp.asarray(aim_o), jnp.asarray(aim_d)

perm_a, inv_a = sort_rays_device(ao, ad, mode="morton")
aimed_sorted = Ray.create(ao[perm_a], ad[perm_a])


def aimed_percall():
    out = trace_closest_hit_tight(scene, aimed_sorted, packet=8192)
    return fence(out.t)


bench("aimed-percall (bench r4)", aimed_percall, n_aimed)
for plan in (None, "key"):
    for sweep in (False, True):
        tr = make_tracer(scene, packet=8192, sweep=sweep, sort="morton",
                         plan=plan)
        bench(f"aimed-tracer plan={plan} sweep={sweep}",
              lambda tr=tr: fence(tr(ao, ad).t), n_aimed)

# crosscheck the key-planned result vs plain
tr0 = make_tracer(scene, packet=8192, sweep=False, sort="morton")
trk = make_tracer(scene, packet=8192, sweep=False, sort="morton", plan="key")
t0a = np.asarray(tr0(ao, ad).t)
tka = np.asarray(trk(ao, ad).t)
bad = (~(np.isclose(t0a, tka, rtol=2e-5) | (np.isinf(t0a) & np.isinf(tka)))).sum()
print(f"aimed key-plan crosscheck: {bad} t mismatches", flush=True)
print("DONE", flush=True)
