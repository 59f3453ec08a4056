"""Batched stackless BVH traversal — the framework's hot path.

The reference traverses one ray at a time: recursively
(``src/bvh/bvh_node.rs:288-319``), with a 32-deep explicit stack
(``src/bvh/iter.rs``), or statelessly over the flat entry/exit layout
(``src/flat_bvh.rs:396-431``). Here the *whole query batch* advances in
lockstep through the flat layout: each lane carries its own node cursor, a
``lax.while_loop`` steps every lane until all cursors pass the end, and each
step is pure gather + VPU vector math. Lanes that finish early idle (masked)
— the classic GPU "persistent threads" shape, which is also the right shape
for XLA:TPU.

Variants:
* ``traverse`` — collect all shapes whose AABB chain passes the query test
  (semantics of reference ``FlatBvh::traverse``), into a fixed-size buffer +
  count (no dynamic shapes on TPU).
* ``closest_hit_triangles`` — fused traversal + Moller-Trumbore, with
  ordered pruning by slab entry distance (descend only if t_entry < best t).
* ``nearest_to`` — pruned nearest-neighbor point query
  (semantics of reference ``FlatBvh::nearest_to``, ``src/flat_bvh.rs:513-562``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ray import Ray, ray_intersects_triangle
from .flat import FlatBvh


def _gather_node(flat: FlatBvh, cursor: jnp.ndarray):
    """Gather per-lane node records; cursor is clamped for finished lanes."""
    n = flat.num_nodes
    c = jnp.minimum(cursor, n - 1)
    return (
        flat.aabb_min[c],
        flat.aabb_max[c],
        flat.entry[c],
        flat.exit[c],
        flat.shape[c],
    )


@partial(jax.jit, static_argnames=("max_hits",))
def traverse(flat: FlatBvh, query, max_hits: int = 64):
    """Collect shapes intersecting ``query`` (any ``Query`` from queries.py).

    Returns ``(hits [R, max_hits] i32, count [R] i32)``. Slots beyond
    ``count`` are -1. If ``count > max_hits`` the buffer overflowed — re-run
    with a larger buffer (fixed-size buffers replace the reference's Vec
    returns; TPU has no dynamic shapes).
    """
    n = flat.num_nodes
    # Query batch shape = shape of its node test against a scalar box.
    probe = query.intersects_node(flat.aabb_min[:1][0], flat.aabb_max[:1][0]) if n else None
    batch_shape = probe.shape if n else ()
    r = batch_shape
    hits0 = jnp.full(r + (max_hits,), -1, jnp.int32)
    count0 = jnp.zeros(r, jnp.int32)
    if n == 0:
        return hits0, count0
    cursor0 = jnp.zeros(r, jnp.int32)

    def cond(state):
        cursor, _, _ = state
        return jnp.any(cursor < n)

    def body(state):
        cursor, hits, count = state
        nmin, nmax, entry, exit_, shape = _gather_node(flat, cursor)
        active = cursor < n
        hit = query.intersects_node(nmin, nmax)
        is_leaf = entry < 0
        record = active & is_leaf & hit
        slot = jnp.minimum(count, max_hits - 1)
        new_val = jnp.where(
            record, shape, jnp.take_along_axis(hits, slot[..., None], axis=-1)[..., 0]
        )
        hits = _set_slot(hits, slot, new_val)
        count = count + record.astype(jnp.int32)
        nxt = jnp.where(is_leaf | ~hit, exit_, entry)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, hits, count

    _, hits, count = jax.lax.while_loop(cond, body, (cursor0, hits0, count0))
    return hits, count


def traverse_all(flat: FlatBvh, query, max_hits: int = 64,
                 grow_limit: int = 1 << 20):
    """``traverse`` with the reference's can't-miss Vec semantics.

    ``traverse`` saturates silently when a lane collects more than
    ``max_hits`` shapes (counts keep incrementing but slots overwrite). This
    host-side wrapper re-runs with a doubled buffer until every lane fits —
    the auto-regrow analog of the reference's unbounded ``Vec<&Shape>``
    return (``src/flat_bvh.rs:396-431``). Each growth step is a new jit
    specialization, but sizes double so the compile count is logarithmic
    and growth stops at the first batch that fits.

    Returns ``(hits, count)`` with ``count <= hits.shape[-1]`` guaranteed
    (raises if ``grow_limit`` would be exceeded — that means the query
    intersects essentially the whole scene and a brute-force mask is the
    right tool).
    """
    k = max_hits
    while True:
        hits, count = traverse(flat, query, max_hits=k)
        overflow = int(jnp.max(count)) if count.size else 0
        if overflow <= k:
            return hits, count
        # counts are exact even when slots saturate, so the retry below
        # always fits: the limit must be enforced on the OBSERVED need
        # (checking k would never fire — one doubling jump ends the loop)
        if overflow > grow_limit:
            raise ValueError(
                f"traverse_all: a lane collected {overflow} hits "
                f"(> grow_limit={grow_limit}); use brute_force_collect")
        # jump straight to the observed requirement (counts are exact even
        # when the buffer saturated), rounded up to the next power of two
        while k < overflow:
            k *= 2


def _set_slot(buf: jnp.ndarray, slot: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    """buf[..., slot] = val per-lane (scatter along the last axis)."""
    k = buf.shape[-1]
    onehot = slot[..., None] == jnp.arange(k, dtype=slot.dtype)
    return jnp.where(onehot, val[..., None], buf)


class HitRecord(NamedTuple):
    """Closest hit per ray: +inf distance == miss; shape_id == -1 on miss."""

    t: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    shape_id: jnp.ndarray


@jax.jit
def closest_hit_triangles(
    flat: FlatBvh, rays: Ray, tri_a: jnp.ndarray, tri_b: jnp.ndarray, tri_c: jnp.ndarray
) -> HitRecord:
    """Fused stackless traversal + Moller-Trumbore closest hit.

    Ordered pruning: a subtree (or leaf) is entered only when the slab entry
    distance beats the current best hit, so lanes skip whole subtrees behind
    their best hit — the batched analog of the reference's early-out orderings.
    """
    n = flat.num_nodes
    r = rays.origin.shape[:-1]
    inf = jnp.asarray(jnp.inf, rays.origin.dtype)
    t0 = jnp.full(r, jnp.inf, rays.origin.dtype)
    z = jnp.zeros(r, rays.origin.dtype)
    id0 = jnp.full(r, -1, jnp.int32)
    if n == 0:
        return HitRecord(t0, z, z, id0)
    cursor0 = jnp.zeros(r, jnp.int32)

    def cond(state):
        return jnp.any(state[0] < n)

    def body(state):
        cursor, t_best, u_best, v_best, id_best = state
        nmin, nmax, entry, exit_, shape = _gather_node(flat, cursor)
        active = cursor < n

        # Slab test with entry distance (reference intersection_slice semantics).
        lbr = (nmin - rays.origin) * rays.inv_direction
        rtr = (nmax - rays.origin) * rays.inv_direction
        has_nan = jnp.any(jnp.isnan(lbr) | jnp.isnan(rtr), axis=-1)
        tmin = jnp.maximum(jnp.minimum(lbr, rtr).max(axis=-1), 0.0)
        tmax = jnp.maximum(lbr, rtr).min(axis=-1)
        box_hit = ~has_nan & (tmin <= tmax)
        useful = box_hit & (tmin < t_best)

        is_leaf = entry < 0
        si = jnp.maximum(shape, 0)
        inter = ray_intersects_triangle(rays, tri_a[si], tri_b[si], tri_c[si])
        closer = active & is_leaf & useful & (inter.distance < t_best)
        t_best = jnp.where(closer, inter.distance, t_best)
        u_best = jnp.where(closer, inter.u, u_best)
        v_best = jnp.where(closer, inter.v, v_best)
        id_best = jnp.where(closer, shape, id_best)

        nxt = jnp.where(is_leaf | ~useful, exit_, entry)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, t_best, u_best, v_best, id_best

    _, t, u, v, sid = jax.lax.while_loop(cond, body, (cursor0, t0, z, z, id0))
    return HitRecord(t, u, v, sid)


@jax.jit
def any_hit_triangles(
    flat: FlatBvh, rays: Ray, tri_a: jnp.ndarray, tri_b: jnp.ndarray, tri_c: jnp.ndarray,
    t_max: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """True per ray as soon as any triangle hit (optionally within t_max) is found."""
    n = flat.num_nodes
    r = rays.origin.shape[:-1]
    found0 = jnp.zeros(r, bool)
    if n == 0:
        return found0
    tm = jnp.full(r, jnp.inf, rays.origin.dtype) if t_max is None else t_max
    cursor0 = jnp.zeros(r, jnp.int32)

    def cond(state):
        cursor, found = state
        return jnp.any((cursor < n) & ~found)

    def body(state):
        cursor, found = state
        nmin, nmax, entry, exit_, shape = _gather_node(flat, cursor)
        active = (cursor < n) & ~found
        lbr = (nmin - rays.origin) * rays.inv_direction
        rtr = (nmax - rays.origin) * rays.inv_direction
        has_nan = jnp.any(jnp.isnan(lbr) | jnp.isnan(rtr), axis=-1)
        tmin = jnp.maximum(jnp.minimum(lbr, rtr).max(axis=-1), 0.0)
        tmax_box = jnp.maximum(lbr, rtr).min(axis=-1)
        useful = ~has_nan & (tmin <= tmax_box) & (tmin < tm)
        is_leaf = entry < 0
        si = jnp.maximum(shape, 0)
        inter = ray_intersects_triangle(rays, tri_a[si], tri_b[si], tri_c[si])
        found = found | (active & is_leaf & useful & (inter.distance < tm))
        nxt = jnp.where(is_leaf | ~useful, exit_, entry)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, found

    _, found = jax.lax.while_loop(cond, body, (cursor0, found0))
    return found


@partial(jax.jit, static_argnames=("distance_squared_fn",))
def nearest_to(flat: FlatBvh, points: jnp.ndarray, distance_squared_fn):
    """Shape-generic nearest-neighbor point query (reference ``nearest_to``).

    ``distance_squared_fn(points [..., D], shape_id [...] i32) -> [...]``
    is the user's exact squared shape distance — the batched analog of the
    reference's ``PointDistance`` trait (``src/point_query.rs:7-10``); the
    traversal prunes subtrees by node-box ``min_distance_squared`` exactly
    like ``src/bvh/bvh_node.rs:327-374`` and calls the hook only at leaves
    (lanes whose pruning failed get a masked call with a clamped id — the
    hook must be total, not side-effecting).

    Returns ``(shape_id [...] i32, distance [...])`` with distance = sqrt of
    the best squared distance (``src/bvh/bvh_impl.rs:221-238``).

    ``distance_squared_fn`` is a STATIC jit argument: pass a stable
    function object (module-level def, or a closure created once) — a
    fresh lambda per call is a fresh cache key and recompiles every time.
    """
    n = flat.num_nodes
    r = points.shape[:-1]
    best_d0 = jnp.full(r, jnp.inf, points.dtype)
    id0 = jnp.full(r, -1, jnp.int32)
    if n == 0:
        return id0, best_d0
    cursor0 = jnp.zeros(r, jnp.int32)

    def cond(state):
        return jnp.any(state[0] < n)

    def body(state):
        cursor, best_d2, best_id = state
        nmin, nmax, entry, exit_, shape = _gather_node(flat, cursor)
        active = cursor < n
        half = (nmax - nmin) * 0.5
        center = nmin + half
        q = jnp.abs(points - center) - half
        node_d2 = jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1)
        useful = node_d2 < best_d2
        is_leaf = entry < 0
        si = jnp.maximum(shape, 0)
        d2 = distance_squared_fn(points, si)
        closer = active & is_leaf & useful & (d2 < best_d2)
        best_d2 = jnp.where(closer, d2, best_d2)
        best_id = jnp.where(closer, shape, best_id)
        nxt = jnp.where(is_leaf | ~useful, exit_, entry)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, best_d2, best_id

    _, best_d2, best_id = jax.lax.while_loop(cond, body, (cursor0, best_d0, id0))
    return best_id, jnp.sqrt(best_d2)


@jax.jit
def nearest_to_triangles(
    flat: FlatBvh,
    points: jnp.ndarray,
    tri_a: jnp.ndarray,
    tri_b: jnp.ndarray,
    tri_c: jnp.ndarray,
):
    """Nearest triangle to each point — ``nearest_to`` with the built-in
    exact point-triangle distance (the reference's testbase ``Triangle``
    PointDistance impl, ``src/testbase.rs:314-443``).
    """
    from ..tri import point_triangle_distance_squared

    def tri_d2(pts, si):
        return point_triangle_distance_squared(pts, tri_a[si], tri_b[si], tri_c[si])

    return nearest_to(flat, points, tri_d2)


# ---------------------------------------------------------------------------
# Brute-force oracles (the reference's "naive list intersect" baselines).


@jax.jit
def brute_force_closest_hit(
    rays: Ray, tri_a: jnp.ndarray, tri_b: jnp.ndarray, tri_c: jnp.ndarray
) -> HitRecord:
    """O(R*N) closest hit, the differential-testing oracle."""
    rr = Ray(
        rays.origin[..., None, :],
        rays.direction[..., None, :],
        rays.inv_direction[..., None, :],
    )
    inter = ray_intersects_triangle(rr, tri_a, tri_b, tri_c)
    best = jnp.argmin(inter.distance, axis=-1)
    take = lambda x: jnp.take_along_axis(x, best[..., None], axis=-1)[..., 0]
    t = take(inter.distance)
    sid = jnp.where(jnp.isfinite(t), best.astype(jnp.int32), -1)
    return HitRecord(t, take(inter.u), take(inter.v), sid)


@jax.jit
def brute_force_collect(query, shape_min: jnp.ndarray, shape_max: jnp.ndarray):
    """Boolean [..., N] mask of shapes whose AABB passes the query test."""
    return jax.vmap(query.intersects_node, in_axes=(0, 0), out_axes=-1)(
        shape_min, shape_max
    )


@partial(jax.jit, static_argnames=("chunk",))
def closest_hit_chunked(
    flat: FlatBvh,
    rays: Ray,
    tri_a: jnp.ndarray,
    tri_b: jnp.ndarray,
    tri_c: jnp.ndarray,
    chunk: int = 8192,
) -> HitRecord:
    """Closest hit over a large ray batch, processed in fixed-size chunks.

    One giant lockstep batch pays the *maximum* traversal length over all
    rays each step; chunking bounds that divergence to within a chunk (the
    ray-tile analog of the persistent-threads pattern). ``R`` must be a
    multiple of ``chunk``.
    """
    r = rays.origin.shape[0]
    if r % chunk:
        raise ValueError(f"ray count {r} not a multiple of chunk {chunk}")
    folded = Ray(*(x.reshape(r // chunk, chunk, -1) for x in rays))
    out = jax.lax.map(
        lambda rr: closest_hit_triangles(flat, rr, tri_a, tri_b, tri_c), folded
    )
    return HitRecord(*(x.reshape(r) for x in out))
