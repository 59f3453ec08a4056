"""A/B: wide group-walk kernel vs entry/exit tight kernel, real TPU, 120k."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import (make_seeder, sort_rays_device,
                               trace_closest_hit_tight)

n_cubes = int(os.environ.get("BW_CUBES", "10000"))
n_rays = int(os.environ.get("BW_RAYS", str(2 << 20)))
packet = int(os.environ.get("BW_PACKET", "4096"))
iters = int(os.environ.get("BW_ITERS", "4"))

a, b, c = tb.create_n_cubes(n_cubes)
scene = build_tight_scene(a, b, c)
print("clusters", scene.num_clusters, "nodes", scene.num_nodes,
      "gnodes", scene.gnodes.shape, "depth", scene.gdepth, flush=True)

seed = tb.seed_state_after(n_cubes)
origins, dirs = tb.create_rays(n_rays, seed=seed)
o_dev = jnp.asarray(origins)
d_dev = jnp.asarray(dirs)


def run(o, d, wide, sweep=True):
    perm, inv = sort_rays_device(o, d, bits=2)
    rays = Ray.create(o[perm], d[perm])
    out = trace_closest_hit_tight(scene, rays, packet=packet, sweep=sweep,
                                  wide=wide)
    t = out.t[inv]
    sid = out.shape_id[inv]
    fence = float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))
    return t, sid, fence


def bench(tag, wide, sweep=True):
    t, sid, _ = run(o_dev, d_dev, wide, sweep)  # compile + warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        t, sid, _ = run(o_dev, d_dev, wide, sweep)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {n_rays / best / 1e6:.2f} M rays/s  ({best:.3f} s)",
          flush=True)
    return np.asarray(t), np.asarray(sid), best


tt, st, _ = bench("tight  sweep", False)
tw, sw, _ = bench("wide   sweep", True)
m = np.isfinite(tt)
assert (np.isfinite(tw) == m).all(), (np.isfinite(tw).sum(), m.sum())
assert (tw[m] == tt[m]).all(), np.abs(tw[m] - tt[m]).max()
assert (sw == st).all()
print("results bit-identical:", m.sum(), "hits", flush=True)

# aimed all-hit workload (seeded)
n_aimed = 1 << 20
centers = a.reshape(-1, 12, 3).mean(axis=1)
idx = np.resize(np.arange(len(centers)), n_aimed)
idx = idx[np.argsort(idx, kind="stable")]
rng = np.random.default_rng(0)
offs = rng.normal(size=(n_aimed, 3)).astype(np.float32)
offs /= np.linalg.norm(offs, axis=1, keepdims=True)
aim_orig = (centers[idx] + offs * 50.0).astype(np.float32)
aim_dirs = (centers[idx] + 0.1 - aim_orig).astype(np.float32)
aimed = Ray.create(jnp.asarray(aim_orig), jnp.asarray(aim_dirs))
seeder = make_seeder(scene, packet=packet)


def bench_aimed(tag, wide):
    def go():
        hints_a = seeder(aimed)
        out = trace_closest_hit_tight(scene, aimed, packet=packet,
                                      hints=hints_a, wide=wide)
        return out, float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))

    out, _ = go()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out, _ = go()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {n_aimed / best / 1e6:.2f} M rays/s  ({best:.3f} s)",
          flush=True)
    return np.asarray(out.t), np.asarray(out.shape_id)


ta, sa = bench_aimed("tight  aimed", False)
wa, swa = bench_aimed("wide   aimed", True)
ma = np.isfinite(ta)
assert (np.isfinite(wa) == ma).all()
assert (wa[ma] == ta[ma]).all()
print("aimed bit-identical:", ma.sum(), "hits", flush=True)
