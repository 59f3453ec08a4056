"""Differentiable closest-hit rendering.

The reference crate is not differentiable; this module adds exact gradients of
hit distance (and barycentrics) w.r.t. triangle vertices and ray origins /
directions — the north-star capability of the TPU build.

Design: traversal is a *discrete* search — it only selects WHICH triangle each
ray hits. Gradients hold that hit topology fixed (the standard convention for
differentiable ray casting away from visibility discontinuities): the
traversal runs with gradients stopped, then the intersection quantities are
recomputed differentiably from the selected triangle via Moller-Trumbore, so
autodiff (or a custom VJP) flows through a single analytic expression.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ray import Ray, ray_intersects_triangle
from ..bvh.flat import FlatBvh
from ..bvh.traverse import HitRecord, closest_hit_triangles


def render_hits(
    flat: FlatBvh,
    rays: Ray,
    tri_a: jnp.ndarray,
    tri_b: jnp.ndarray,
    tri_c: jnp.ndarray,
) -> HitRecord:
    """Closest hit with differentiable t/u/v (w.r.t. vertices and rays).

    ``shape_id`` is integer (no gradient); ``t`` is +inf on miss, and the
    gradient of masked-out lanes is zero.
    """
    sg = jax.lax.stop_gradient
    hard = closest_hit_triangles(
        sg(flat), sg(rays), sg(tri_a), sg(tri_b), sg(tri_c)
    )
    sid = hard.shape_id
    safe = jnp.maximum(sid, 0)
    g9 = jnp.concatenate([tri_a, tri_b, tri_c], axis=1)[safe]  # one gather
    inter = ray_intersects_triangle(rays, g9[:, 0:3], g9[:, 3:6], g9[:, 6:9])
    hit_mask = sid >= 0
    inf = jnp.asarray(jnp.inf, hard.t.dtype)
    t = jnp.where(hit_mask, inter.distance, inf)
    u = jnp.where(hit_mask, inter.u, 0.0)
    v = jnp.where(hit_mask, inter.v, 0.0)
    return HitRecord(t, u, v, sid)


def render_depth(
    flat: FlatBvh,
    rays: Ray,
    tri_a: jnp.ndarray,
    tri_b: jnp.ndarray,
    tri_c: jnp.ndarray,
    background: float = 0.0,
):
    """Depth image: hit distance, ``background`` on miss. Differentiable."""
    hit = render_hits(flat, rays, tri_a, tri_b, tri_c)
    depth = jnp.where(hit.shape_id >= 0, hit.t, background)
    return depth, hit.shape_id >= 0


def render_hits_fast(scene, rays: Ray, tri_a, tri_b, tri_c, packet: int = 2048,
                     interpret: bool = False, hints=None,
                     start_g=None) -> HitRecord:
    """``render_hits`` with the Pallas tight-cluster kernel as the hard pass.

    The kernel runs under ``stop_gradient`` (discrete hit selection carries no
    gradient anyway); t/u/v are then recomputed differentiably on the winning
    triangle exactly as in ``render_hits``. ``scene`` is a
    ``ops.cluster.TightScene`` built over the same triangles.

    ``hints``: optional seeding hints from ``ops.trace.compute_seed_hints``
    (compute once per ray batch OUTSIDE jit; +35% on hit-dense batches).
    """
    from ..ops.trace import trace_closest_hit_tight

    sg = jax.lax.stop_gradient
    hard = trace_closest_hit_tight(
        scene,
        Ray(sg(rays.origin), sg(rays.direction), sg(rays.inv_direction)),
        packet=packet,
        interpret=interpret,
        hints=hints,
        start_g=start_g,
    )
    sid = sg(hard.shape_id)
    safe = jnp.maximum(sid, 0)
    # ONE interleaved gather instead of three: XLA gather cost on this
    # chip tracks the NUMBER of gather ops, not bytes (round-5 probe:
    # 3x[n,3] 33.6 ms vs 1x[n,9] 9.2 ms per 1M rays). Slicing the
    # gathered concat is bit-identical to the per-array gathers, and the
    # VJP turns into one scatter + column splits the same way.
    g9 = jnp.concatenate([tri_a, tri_b, tri_c], axis=1)[safe]
    inter = ray_intersects_triangle(rays, g9[:, 0:3], g9[:, 3:6], g9[:, 6:9])
    # The kernel's bilinear test can accept a grazing hit the exact
    # Moller-Trumbore recompute rejects (u/v boundary rounding); such rays
    # count as misses here so depth/gradients stay finite.
    hit_mask = (sid >= 0) & jnp.isfinite(sg(inter.distance))
    sid = jnp.where(hit_mask, sid, -1)
    inf = jnp.asarray(jnp.inf, hard.t.dtype)
    t = jnp.where(hit_mask, inter.distance, inf)
    u = jnp.where(hit_mask, inter.u, 0.0)
    v = jnp.where(hit_mask, inter.v, 0.0)
    return HitRecord(t, u, v, sid)


def render_depth_fast(scene, rays: Ray, tri_a, tri_b, tri_c,
                      background: float = 0.0, packet: int = 2048,
                      interpret: bool = False, hints=None, start_g=None):
    """``render_depth`` on the Pallas fast path. Differentiable."""
    hit = render_hits_fast(scene, rays, tri_a, tri_b, tri_c, packet=packet,
                           interpret=interpret, hints=hints, start_g=start_g)
    depth = jnp.where(hit.shape_id >= 0, hit.t, background)
    return depth, hit.shape_id >= 0
