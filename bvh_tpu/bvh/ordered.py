"""Distance-ordered traversal.

The reference offers two per-ray orderings: an exact one driven by a binary
heap on slab entry/exit distances (``src/bvh/distance_traverse.rs`` —
correct even when children overlap) and a best-effort nearer-child-first
stack walk (``src/bvh/child_distance_traverse.rs``). A heap per ray is the
wrong shape for a batched machine; here the whole batch collects its leaf
hits (with entry/exit distances) in one stackless sweep and sorts each ray's
fixed-size buffer — exact ordering (matching the heap variant's guarantee),
O(K log K) per ray on sorted lanes, no per-ray data structures.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ray import Ray
from .flat import FlatBvh
from .traverse import _gather_node


@partial(jax.jit, static_argnames=("max_hits", "ascending"))
def ordered_traverse(flat: FlatBvh, rays: Ray, max_hits: int = 32, ascending: bool = True):
    """Shapes whose AABBs the rays hit, ordered by distance per ray.

    Ascending: by slab entry distance (closest first). Descending: by slab
    exit distance (farthest first) — the reference's two orderings.

    Returns ``(shape_ids [R, max_hits], distances [R, max_hits], count [R])``;
    unused slots hold -1 / +inf (ascending) or -inf (descending). If
    ``count > max_hits`` the buffer overflowed; re-run with a larger one.
    """
    n = flat.num_nodes
    r = rays.origin.shape[:-1]
    pad_dist = jnp.inf if ascending else -jnp.inf
    ids0 = jnp.full(r + (max_hits,), -1, jnp.int32)
    dist0 = jnp.full(r + (max_hits,), pad_dist, jnp.float32)
    count0 = jnp.zeros(r, jnp.int32)
    if n == 0:
        return ids0, dist0, count0
    cursor0 = jnp.zeros(r, jnp.int32)

    def cond(state):
        return jnp.any(state[0] < n)

    def body(state):
        cursor, ids, dist, count = state
        nmin, nmax, entry, exit_, shape = _gather_node(flat, cursor)
        active = cursor < n
        lbr = (nmin - rays.origin) * rays.inv_direction
        rtr = (nmax - rays.origin) * rays.inv_direction
        has_nan = jnp.any(jnp.isnan(lbr) | jnp.isnan(rtr), axis=-1)
        tmin = jnp.maximum(jnp.minimum(lbr, rtr).max(axis=-1), 0.0)
        tmax = jnp.maximum(lbr, rtr).min(axis=-1)
        hit = ~has_nan & (tmin <= tmax)
        is_leaf = entry < 0
        record = active & is_leaf & hit
        key = tmin if ascending else tmax

        slot = jnp.minimum(count, max_hits - 1)
        onehot = slot[..., None] == jnp.arange(max_hits, dtype=slot.dtype)
        write = onehot & record[..., None]
        ids = jnp.where(write, shape[..., None], ids)
        dist = jnp.where(write, key[..., None], dist)
        count = count + record.astype(jnp.int32)

        nxt = jnp.where(is_leaf | ~hit, exit_, entry)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, ids, dist, count

    _, ids, dist, count = jax.lax.while_loop(cond, body, (cursor0, ids0, dist0, count0))
    order = jnp.argsort(dist if ascending else -dist, axis=-1, stable=True)
    ids = jnp.take_along_axis(ids, order, axis=-1)
    dist = jnp.take_along_axis(dist, order, axis=-1)
    return ids, dist, count


@partial(jax.jit, static_argnames=("max_hits",))
def nearest_traverse(flat: FlatBvh, rays: Ray, max_hits: int = 32):
    """Closest-first candidates (reference ``nearest_traverse_iterator``)."""
    return ordered_traverse(flat, rays, max_hits, ascending=True)


@partial(jax.jit, static_argnames=("max_hits",))
def farthest_traverse(flat: FlatBvh, rays: Ray, max_hits: int = 32):
    """Farthest-first candidates (reference ``farthest_traverse_iterator``)."""
    return ordered_traverse(flat, rays, max_hits, ascending=False)
