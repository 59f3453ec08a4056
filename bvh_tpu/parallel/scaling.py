"""Scaling-efficiency harness: rays/s vs shard count over the device mesh.

The north star asks for N-chip / N-host scaling numbers; the reference has
nothing to scale (one process, rayon threads). This harness times the
sharded tracer at 1/2/4/...-way ray sharding on whatever devices exist —
real chips on a pod, or the virtual 8-device CPU mesh in tests/dryrun
(where the *numbers* are meaningless but the harness, shardings and
collectives are fully exercised).

Hot-loop design recap (parallel/tight.py): scene replicated, rays sharded,
zero inter-chip traffic during traversal — efficiency should be ~1.0 until
the per-chip batch is too small to amortize dispatch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..ray import Ray
from .mesh import make_mesh
from .tight import sharded_trace_closest_hit


def ray_scaling_report(scene, rays: Ray, shard_counts=(1, 2, 4, 8),
                       packet: int = 2048, iters: int = 3,
                       interpret: bool = False, time_fn=time.perf_counter):
    """Times the ray-sharded tracer at each shard count.

    Returns ``{n: {"rays_per_s": float, "efficiency": float}}`` where
    efficiency is rays/s relative to perfect linear scaling from the
    smallest shard count measured (``rps_n / (rps_base * n / base)``).
    Shard counts beyond ``jax.device_count()`` are skipped.
    """
    r = rays.origin.shape[0]
    report = {}
    base_n = None
    base_rps = None
    for n in shard_counts:
        if n > jax.device_count():
            continue
        mesh = make_mesh(n, scene_shards=1)

        def run():
            hit = sharded_trace_closest_hit(mesh, scene, rays, packet=packet,
                                            interpret=interpret)
            # host-forced reduction: the only reliable fence on remote-
            # attached devices (block_until_ready does not block on axon)
            return float(jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)))

        run()  # compile + warm
        best = float("inf")
        for _ in range(max(iters, 1)):
            t0 = time_fn()
            run()
            best = min(best, time_fn() - t0)
        rps = r / best
        if base_rps is None:
            base_n, base_rps = n, rps
        report[n] = {
            "rays_per_s": rps,
            "efficiency": rps / (base_rps * n / base_n),
        }
    return report
