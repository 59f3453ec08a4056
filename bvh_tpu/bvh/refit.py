"""Incremental update: vectorized AABB refit over the flat arrays.

The reference's ``update_shapes`` removes and re-inserts every moved shape
one at a time (``src/bvh/optimization.rs:304-315``) — a pointer-chasing
serial algorithm. The TPU analog keeps the topology fixed and refits: leaf
boxes are re-gathered from the (moved) shapes and parent boxes are rebuilt
bottom-up with masked join sweeps until a fixpoint — O(depth) vectorized
passes, jittable, and the result satisfies the same contract the reference
asserts after updates (consistent + tight). Tree *quality* degrades with
movement exactly like any refit; rebuild when churn is high (the reference
documents the same tradeoff, README.md:192-247).

Topology-editing updates (add/remove, SAH-guided reinsertion) live on the
host pointer tree in ``tree.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flat import LEAF, FlatBvh


@jax.jit
def refit(flat: FlatBvh, shape_min: jnp.ndarray, shape_max: jnp.ndarray) -> FlatBvh:
    """Rebuild all node AABBs from (possibly moved) shape AABBs.

    Returns a new ``FlatBvh`` with identical topology, tight boxes.
    """
    n = flat.num_nodes
    if n == 0:
        return flat
    is_leaf = flat.entry == LEAF
    sid = jnp.clip(flat.shape, 0, None)
    leaf_min = shape_min[sid]
    leaf_max = shape_max[sid]
    left = jnp.clip(flat.entry, 0, n - 1)
    right = jnp.clip(flat.exit[left], 0, n - 1)

    d = shape_min.shape[1]
    amin0 = jnp.where(is_leaf[:, None], leaf_min, jnp.inf)
    amax0 = jnp.where(is_leaf[:, None], leaf_max, -jnp.inf)
    # One packed record per node (amin, amax, ready) so each sweep costs two
    # row-gathers instead of six — gathers dominate the sweep on TPU.
    rec0 = jnp.concatenate(
        [amin0, amax0, is_leaf.astype(jnp.float32)[:, None]], axis=1
    )  # [n, 2d+1]

    def body(rec):
        rl = rec[left]
        rr = rec[right]
        can = (rec[:, -1] == 0.0) & (rl[:, -1] > 0.0) & (rr[:, -1] > 0.0)
        new = jnp.concatenate(
            [
                jnp.minimum(rl[:, :d], rr[:, :d]),
                jnp.maximum(rl[:, d:2 * d], rr[:, d:2 * d]),
                jnp.ones((rec.shape[0], 1), jnp.float32),
            ],
            axis=1,
        )
        return jnp.where(can[:, None], new, rec)

    rec = jax.lax.while_loop(lambda r: r[0, -1] == 0.0, body, rec0)
    return flat._replace(aabb_min=rec[:, :d], aabb_max=rec[:, d:2 * d])


@jax.jit
def update_shapes(flat: FlatBvh, shape_min: jnp.ndarray, shape_max: jnp.ndarray) -> FlatBvh:
    """Reference ``update_shapes`` contract on the device path: after moving
    any subset of shapes, return a BVH that is consistent and tight.

    (The changed-index set isn't needed — the refit sweep is O(n) vectorized
    regardless, which on TPU is cheaper than tracking a sparse frontier.)
    """
    return refit(flat, shape_min, shape_max)
