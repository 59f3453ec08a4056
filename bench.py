"""Headline benchmark: closest-hit ray traversal throughput on one TPU chip.

Workload mirrors the reference's flagship bench (`bench_intersect_120k_triangles_bvh`,
README.md:178): the deterministic 120k-triangle random-cube scene and the same
splitmix64 ray distribution (origin and direction drawn inside the ±100k
bounds), traced closest-hit through a SAH BVH. The reference measures
853 ns/ray on one Ryzen 3900X core = 1.172 M rays/s; `vs_baseline` is the
ratio of this chip's rays/s over that number.

Prints ONE JSON line on stdout.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bvh_tpu import Ray
    from bvh_tpu import testbase as tb
    from bvh_tpu.bvh import build_sah
    from bvh_tpu.bvh.traverse import closest_hit_chunked

    n_cubes = int(os.environ.get("BENCH_CUBES", "10000"))  # 120k triangles
    n_rays = int(os.environ.get("BENCH_RAYS", str(1 << 20)))
    chunk = int(os.environ.get("BENCH_CHUNK", "16384"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    a, b, c = tb.create_n_cubes(n_cubes)
    mn, mx = tb.tri_aabbs(a, b, c)

    t0 = time.perf_counter()
    flat, _ = build_sah(mn, mx)
    build_s = time.perf_counter() - t0

    # Reference-distribution rays, continuing the scene's seed stream.
    seed = tb.seed_state_after(n_cubes)
    origins, dirs = tb.create_rays(n_rays, seed=seed)
    rays = Ray.create(jnp.asarray(origins), jnp.asarray(dirs))
    dev = flat.to_device()
    a_, b_, c_ = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    def run(r):
        out = closest_hit_chunked(dev, r, a_, b_, c_, chunk=chunk)
        # NOTE: block_until_ready does not actually block on the axon
        # platform; a reduction forced to host is the only reliable fence.
        fence = float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))
        return out, fence

    out, _ = run(rays)  # compile + warmup

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out, _ = run(rays)
        best = min(best, time.perf_counter() - t0)

    rays_per_s = n_rays / best

    # Secondary (hard) workload: aimed rays that all hit — deep traversals,
    # the path the Sponza-class target cares about. Not the headline because
    # the reference's own bench uses the sparse random-ray distribution above.
    n_aimed = min(n_rays, 1 << 17)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    idx = np.resize(np.arange(len(centers)), n_aimed)
    aim_orig = (centers[idx] + np.array([3000.0, 1500.0, -2000.0], np.float32)).astype(np.float32)
    aim_at = centers[idx] + np.array([0.11, 0.07, -0.13], np.float32)
    aimed = Ray.create(jnp.asarray(aim_orig), jnp.asarray((aim_at - aim_orig).astype(np.float32)))
    def run_aimed():
        out_a = closest_hit_chunked(dev, aimed, a_, b_, c_, chunk=chunk)
        return out_a, float(jnp.sum(jnp.where(jnp.isfinite(out_a.t), out_a.t, 0.0)))

    out_a, _ = run_aimed()
    t0 = time.perf_counter()
    out_a, _ = run_aimed()
    aimed_s = time.perf_counter() - t0
    aimed_rays_per_s = n_aimed / aimed_s
    baseline = 1.0 / 853e-9  # reference: 853 ns/ray, README.md:178
    hit_frac = float(np.isfinite(np.asarray(out.t)).mean())
    result = {
        "metric": f"closest_hit_rays_per_s_{12 * n_cubes // 1000}k_tris",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / baseline, 3),
        "detail": {
            "device": str(jax.devices()[0]),
            "n_rays": n_rays,
            "chunk": chunk,
            "best_s": round(best, 4),
            "host_sah_build_s": round(build_s, 3),
            "hit_fraction": round(hit_frac, 4),
            "aimed_all_hit_rays_per_s": round(aimed_rays_per_s),
            "baseline": "svenstaro/bvh 853ns/ray (120k tris, Ryzen 3900X core, README.md:178)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
