"""Decompose the sparse-1M chained trace (round-4: 0.96 M rays/s, target 2M).

Questions: where does the time go across the 6 Morton parts —
(a) per-part kernel serial iterations on surviving packets,
(b) the per-part XLA merge chain (t_max rebuild + best_t/best_id wheres),
(c) gated-off dispatch overhead (sweep + main grids that do nothing)?

Legs:
  full          trace_closest_hit_chained as benched (sweep on)
  nosweep       sweep off (gate only)
  parts=1..N    cumulative part prefixes (marginal cost per part)
  gate-stats    per-part surviving packet counts (from _part_root_gate)

Run: python scratch/sparse_diag.py  (NOT while pytest/bench runs)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_chained_scene, ChainedScene
from bvh_tpu.ops.trace import (_pack_rays_tight, _part_root_gate, _dev,
                               sort_rays_device, trace_closest_hit_chained)

N_CUBES = int(os.environ.get("CUBES", "84000"))
N_RAYS = int(os.environ.get("RAYS", str(2 << 20)))
PACKET = int(os.environ.get("P", "8192"))

a, b, c = tb.create_n_cubes(N_CUBES)
ch = build_chained_scene(a, b, c)
print(f"parts: {len(ch.parts)}", flush=True)
seed = tb.seed_state_after(N_CUBES)
o, d = tb.create_rays(N_RAYS, seed=seed)
oj, dj = jnp.asarray(o), jnp.asarray(d)
perm, inv = sort_rays_device(oj, dj, bits=2)
rays_s = Ray.create(oj[perm], dj[perm])


def fence(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def bench(label, fn, iters=3):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:18s} {best:.4f}s  {N_RAYS/best/1e6:6.2f} M rays/s",
          flush=True)
    return best


# gate stats: per-part surviving packets at t_max=inf (first-touch upper bound)
base = _pack_rays_tight(rays_s, PACKET, None)
bt = jnp.full((N_RAYS,), jnp.inf, jnp.float32)
for i, part in enumerate(ch.parts):
    root = _dev(part.smem_nodes)[:6, 0]
    g = np.asarray(_part_root_gate(base[2], root, bt))
    print(f"part {i}: {int(g.sum())}/{g.shape[0]} packets fire (cold gate)",
          flush=True)

bench("full-sweep", lambda: fence(
    trace_closest_hit_chained(ch, rays_s, packet=PACKET, sweep=True).t))
bench("full-nosweep", lambda: fence(
    trace_closest_hit_chained(ch, rays_s, packet=PACKET, sweep=False).t))
for n in range(1, len(ch.parts) + 1):
    sub = ChainedScene(parts=ch.parts[:n], orig_ids=ch.orig_ids[:n])
    bench(f"parts<={n}", lambda sub=sub: fence(
        trace_closest_hit_chained(sub, rays_s, packet=PACKET, sweep=True).t))
print("DONE", flush=True)
