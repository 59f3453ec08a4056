"""A/B the wide-walk chain experiments on the headline workload (real TPU).

The round-3 roofline put the wide walk at ~2896 ns/iteration while the
isolated serialized group test costs 1263 ns (gt_bench.py variant A) —
~1.6 us/iter of walk overhead. Variants (ops/trace.py `exp=` knob):

  base    — current kernel
  nwhen   — pl.when(lm != 0) around the nested narrow-mask loop (on the
            miss-heavy headline ~0% of iterations fire leaves, yet every
            iteration enters the zero-trip nested while)
  dual    — two interleaved walk streams over disjoint root subtrees;
            stream B's vector group test overlaps stream A's scalar
            mask-pop tail (NOTE: tie-class winners may differ — the
            crosscheck reports but tolerates <=0.01% id flips)
  dual-nwhen — both

Legs time the UNGATED wide trace (sweep off) on presorted rays at P8192,
mirroring bench.py's roofline configuration, and cross-check results
bit-identically against base.

Run: python scratch/wide_chain_ab.py   (NOT while pytest/bench runs)
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
from bvh_tpu.ops import trace as tr

N_CUBES = int(os.environ.get("CUBES", "10000"))
N_RAYS = int(os.environ.get("RAYS", str(2 << 20)))
PACKET = int(os.environ.get("P", "8192"))
EXPS = os.environ.get("EXPS", "base,nwhen").split(",")
INTERP = os.environ.get("INTERP", "0") == "1"
if INTERP:
    import jax
    jax.config.update("jax_platforms", "cpu")

a, b, c = tb.create_n_cubes(N_CUBES)
scene = build_tight_scene(a, b, c)
seed = tb.seed_state_after(N_CUBES)
origins, dirs = tb.create_rays(N_RAYS, seed=seed)
o_dev, d_dev = jnp.asarray(origins), jnp.asarray(dirs)
perm, inv = tr.sort_rays_device(o_dev, d_dev, bits=2)
rays_s = Ray.create(o_dev[perm], d_dev[perm])

def run(exp, sweep=False):
    e = "" if exp == "base" else exp
    out = tr.trace_closest_hit_tight(scene, rays_s, packet=PACKET,
                                     sweep=sweep, interpret=INTERP, _exp=e)
    f = float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))
    return out, f


def bench(label, fn, iters=4):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best:.4f}s  {N_RAYS/best/1e6:7.2f} M rays/s",
          flush=True)
    return best


ref_out = None
for exp in EXPS:
    if "chainonly" in exp or "walkall" in exp:
        # decomposition probes: results are garbage (narrowphase off);
        # report seconds AND ns/iteration from the probe's own counters
        e = exp
        iters, _, gtests = tr.count_visits_wide(scene, rays_s, packet=PACKET,
                                                interpret=INTERP, exp=e)
        it_tot = int(iters.sum())
        best = bench(f"probe {exp} P{PACKET}", lambda e=e: run(e)[1])
        print(f"  {exp}: iters_total {it_tot}  "
              f"ns/iter {(best - 0.027) * 1e9 / max(it_tot, 1):.0f}  "
              f"(fence-corrected)", flush=True)
        continue
    out, _ = run(exp)
    tt = np.asarray(out.t)
    ss = np.asarray(out.shape_id)
    if ref_out is None:
        ref_out = (tt, ss)
    else:
        tie_class = ("dual" in exp) or ("fr" in exp)
        # fr/frs: looser vb pruning reaches packed-min tie candidates the
        # exact walk pruned — t may differ by the stolen low bits (~W ulps)
        dm = int((~(np.isclose(tt, ref_out[0], equal_nan=True,
                               rtol=2e-5 if tie_class else 1e-8)
                    | (np.isinf(tt) & np.isinf(ref_out[0])))).sum())
        im = int((ss != ref_out[1]).sum())
        print(f"CROSSCHECK {exp}: t mismatches {dm}, id mismatches {im}",
              flush=True)
        if tie_class:
            assert dm == 0 and im <= N_RAYS // 10000, f"{exp} diverged"
        else:
            assert dm == 0 and im == 0, f"{exp} diverged from base"
    bench(f"ungated wide {exp} P{PACKET}", lambda e=exp: run(e)[1])
    bench(f"sweep   wide {exp} P{PACKET}", lambda e=exp: run(e, sweep=True)[1])
print("DONE", flush=True)
