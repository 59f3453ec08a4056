"""Follow-up A/B pass after the round-3 master bench.

Master-bench hardware findings this targets (random 120k, 2M rays, P=4096):
  narrow presort 4.35 M | wide presort 4.89 M | narrow perm 3.11 M |
  wide perm 3.38 M | wide perm NOSWEEP 3.61 M.
So: perm-folded pack LOSES ~0.19s to presort (12 per-field gathers cost
more than one ray gather + pack transposes), and sweep may have inverted
on the wide path. Legs here:
  1. wide presort NOSWEEP (completes the sweep A/B on the winning path)
  2. packet sweep {2048, 4096, 8192} on wide presort
  3. prep decomposition: sort+gather+pack alone vs full trace (wide)
  4. sort bits {2, 3} on wide presort

Usage: timeout 3000 python scratch/tpu_followup_bench.py 2>&1 | tee /tmp/followup_bench.log
NEVER run while pytest or the master bench runs (1 host core).
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
from bvh_tpu.ops.trace import sort_rays_device, trace_closest_hit_tight

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


def run(packet, sweep, bits=2, wide=True):
    perm, inv = sort_rays_device(o_dev, d_dev, bits=bits)
    rays = Ray.create(o_dev[perm], d_dev[perm])
    out = trace_closest_hit_tight(scene, rays, packet=packet, sweep=sweep,
                                  wide=wide, interpret=INTERP)
    t = out.t[inv]
    return float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))


# --- leg 1: sweep A/B on wide presort ---
bench("wide presort sweep P4096", lambda: run(4096, True))
bench("wide presort NOSWEEP P4096", lambda: run(4096, False))

# --- leg 2: packet sweep ---
for p in (2048, 8192):
    bench(f"wide presort sweep P{p}", lambda p=p: run(p, True))
    bench(f"wide presort NOSWEEP P{p}", lambda p=p: run(p, False))

# --- leg 3: prep decomposition (sort + ray gather + fence only) ---
def run_prep(bits=2):
    perm, inv = sort_rays_device(o_dev, d_dev, bits=bits)
    o_s, d_s = o_dev[perm], d_dev[perm]
    return float(jnp.sum(o_s[:, 0]) + jnp.sum(d_s[:, 0]) + jnp.sum(inv))


bench("prep sort+gather only", run_prep)

# --- leg 4: sort bits ---
bench("wide presort NOSWEEP bits3", lambda: run(4096, False, bits=3))

print("FOLLOWUP DONE", flush=True)
