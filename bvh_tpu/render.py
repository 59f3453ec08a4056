"""Fused wavefront path tracing — multi-bounce rendering in ONE jitted step.

The reference ends at single-query traversal; a renderer built on it loops
on the host. Here the whole bounce pipeline — closest-hit trace, shading,
next-event-estimation shadow rays, bounce generation — is one XLA program:
the Pallas trace kernels stay kernels, and everything between them fuses
into their epilogues, so no intermediate ever leaves the device and the
host issues exactly one dispatch per frame (the TPU-shaped version of a
GPU "wavefront" path tracer).

Dead lanes are parked at origin 2e30 rather than compacted: XLA
sort/gather compaction costs more than tracing a lane that prunes at the
root (see ops/trace.py header notes on data-movement rates). Bounce waves
are likewise NOT re-sorted: they inherit the primary tiles' image-space
coherence (measured interpret-mode on the dense mesh: as-is 26 iters /
101 fires per packet vs 22 / 107 morton-resorted — a wash before paying
the per-wave argsort).

Re-designs the reference's examples/simple.rs usage pattern at production
scale; the shading model matches examples/pathtrace.py (Lambertian +
point-light NEE + sky miss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ray import Ray


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def make_pathtracer(scene, tris, bounces: int = 2, packet: int = 2048,
                    light_pos=(12.0, 22.0, 8.0),
                    light_col=(1.4, 1.344, 1.26),
                    sky=(0.45, 0.6, 0.85),
                    albedo=(0.75, 0.72, 0.68),
                    light_power: float = 500.0,
                    interpret: bool = False):
    """Builds a jitted ``trace(origins, directions, key) -> color`` renderer.

    ``scene`` is a TightScene (closure-captured so its static metadata stays
    Python ints under jit); ``tris`` the (a, b, c) vertex arrays for exact
    hit recompute and normals. Each call runs ``bounces + 1`` closest-hit
    waves and ``bounces + 1`` shadow waves fully on device.
    """
    from .ops.trace import trace_any_hit_tight, trace_closest_hit_tight

    aj, bj, cj = (jnp.asarray(x) for x in tris)
    # one interleaved gather per wave instead of three (gather cost
    # tracks op COUNT on this chip — r5: 3x[n,3] 33.6 vs 1x[n,9] 9.2 ms/1M)
    v9 = jnp.concatenate([aj, bj, cj], axis=1)
    lp = jnp.asarray(light_pos, jnp.float32)
    lc = jnp.asarray(light_col, jnp.float32)
    sk = jnp.asarray(sky, jnp.float32)
    al = jnp.asarray(albedo, jnp.float32)

    @jax.jit
    def trace(o, d, key):
        npx = o.shape[0]
        color = jnp.zeros((npx, 3), jnp.float32)
        throughput = jnp.ones((npx, 3), jnp.float32)
        alive = jnp.ones((npx,), bool)

        for bounce in range(bounces + 1):
            rays = Ray.create(o, d)
            # bounce waves scatter into the sky: the sweep pre-pass skips
            # packets that cannot hit (primary wave is usually hit-dense,
            # so it stays inline)
            hit = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj),
                                          packet=packet, interpret=interpret,
                                          sweep=bounce > 0)
            t = hit.t
            sid = jnp.maximum(hit.shape_id, 0)
            found = jnp.isfinite(t)
            miss = ~found & alive
            color = color + jnp.where(miss[:, None], throughput * sk, 0.0)
            hitm = found & alive

            t_safe = jnp.where(found, t, 0.0)
            p = o + _normalize(d) * t_safe[:, None]
            g9 = v9[sid]
            nrm = _normalize(jnp.cross(g9[:, 3:6] - g9[:, 0:3],
                                       g9[:, 6:9] - g9[:, 0:3]))
            nrm = jnp.where((jnp.sum(nrm * d, -1) > 0)[:, None], -nrm, nrm)

            # next-event estimation: one shadow wave to the point light
            to_l = lp[None] - p
            dist_l = jnp.linalg.norm(to_l, axis=-1)
            wl = to_l / jnp.maximum(dist_l[:, None], 1e-20)
            sh_o = jnp.where(hitm[:, None], p + nrm * 1e-3, 2.0e30)
            occluded = trace_any_hit_tight(
                scene, Ray.create(sh_o, wl), t_max=dist_l * 0.999,
                packet=packet, interpret=interpret, sweep=True)
            ndl = jnp.maximum(jnp.sum(nrm * wl, -1), 0.0)
            lit = hitm & ~occluded
            falloff = light_power / jnp.maximum(dist_l, 1.0) ** 2
            color = color + jnp.where(
                lit[:, None],
                throughput * al[None] * lc[None] * (ndl * falloff)[:, None],
                0.0)

            alive = hitm
            if bounce == bounces:
                break
            throughput = jnp.where(alive[:, None], throughput * al[None], throughput)
            key, sub = jax.random.split(key)
            u = _normalize(jax.random.normal(sub, (npx, 3), jnp.float32))
            u = jnp.where(jnp.sum(u * nrm, -1, keepdims=True) < 0, -u, u)
            # dead lanes park far away: they miss at the root next wave
            o = jnp.where(alive[:, None], p + nrm * 1e-3, 2.0e30)
            d = jnp.where(alive[:, None], _normalize(nrm + u), 1.0)

        return color

    return trace
