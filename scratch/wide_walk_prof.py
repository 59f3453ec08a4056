"""Profile the REAL wide walk on the headline scene: where do 3.4us/iter go?

Legs:
  1. ungated wide trace (headline kernel, sweep off) — the 0.41s baseline
  2. count_visits_wide — same walk + counters (sanity: iters/packet)
  3. wide trace with the narrowphase gutted (monkeypatched to a cheap
     vb update) — isolates the narrow region's register-pressure cost
  4. wide trace at P4096/P2048 — packet scaling of the per-iteration cost

Run: python scratch/wide_walk_prof.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops import trace as tr

N_CUBES = 10000
N_RAYS = 2 << 20
PACKET = int(os.environ.get("P", "8192"))

a, b, c = tb.create_n_cubes(N_CUBES)
scene = build_tight_scene(a, b, c)
seed = tb.seed_state_after(N_CUBES)
origins, dirs = tb.create_rays(N_RAYS, seed=seed)
o_dev, d_dev = jnp.asarray(origins), jnp.asarray(dirs)
perm, inv = tr.sort_rays_device(o_dev, d_dev, bits=2)
rays_s = Ray.create(o_dev[perm], d_dev[perm])


def bench(name, fn, iters=4):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.4f}s", flush=True)
    return best


def run_ungated(packet=PACKET):
    out = tr.trace_closest_hit_tight(scene, rays_s, packet=packet)
    return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))


def run_counts(packet=PACKET):
    it, fi, gt = tr.count_visits_wide(scene, rays_s, packet=packet)
    return (float(jnp.sum(it)), float(jnp.sum(fi)), float(jnp.sum(gt)),
            it.shape[0])


best_u = bench("ungated wide P%d" % PACKET, run_ungated)

t0 = time.perf_counter()
it, fi, gt, npk = run_counts()
print(f"counts: iters={it:.0f} fires={fi:.0f} gtests={gt:.0f} "
      f"packets={npk} iters/pkt={it/npk:.0f} "
      f"ns/iter(from ungated)={best_u*1e9/max(it,1):.0f}", flush=True)

# gut the narrowphase: replace _narrow_cluster with a trivial best-k update
_orig = tr._narrow_cluster


def _nop_narrow(c, ccx, ccy, ccz, box6, groups_ref, slab_ref, lmat_ref,
                bestk_ref, bestc_ref, vb_ref, **kw):
    bestc_ref[:, :] = jnp.minimum(bestc_ref[:, :], c)


tr._narrow_cluster = _nop_narrow
tr._trace_wide_jit._clear_cache()
try:
    best_g = bench("ungated wide P%d GUTTED narrowphase" % PACKET, run_ungated)
    print(f"  -> ns/iter gutted: {best_g*1e9/max(it,1):.0f}", flush=True)
finally:
    tr._narrow_cluster = _orig
    tr._trace_wide_jit._clear_cache()

for p in (4096, 2048):
    bu = bench(f"ungated wide P{p}", lambda p=p: run_ungated(p))
    itp, fip, gtp, npkp = run_counts(p)
    print(f"  counts P{p}: iters={itp:.0f} iters/pkt={itp/npkp:.0f} "
          f"ns/iter={bu*1e9/max(itp,1):.0f}", flush=True)
print("DONE", flush=True)
