"""Query polymorphism: the analog of the reference's ``IntersectsAabb`` trait.

Anything that can test itself against a node AABB can drive a BVH traversal
(reference: ``src/aabb/intersection.rs:7-45`` — implemented there by Ray, Aabb,
Point and Ball). Here a *query* is any pytree with a method
``intersects_node(node_min, node_max) -> bool`` where the node arrays broadcast
against the query batch. Traversal code is written once against this duck type
and jitted per concrete query class.
"""

from __future__ import annotations

from typing import NamedTuple, Protocol

import jax.numpy as jnp

from .aabb import Aabb
from .ball import Ball
from .ray import Ray, ray_intersects_aabb


class Query(Protocol):
    def intersects_node(self, node_min: jnp.ndarray, node_max: jnp.ndarray) -> jnp.ndarray: ...


class RayQuery(NamedTuple):
    """Traversal driven by a ray batch (slab test prunes nodes)."""

    ray: Ray

    def intersects_node(self, node_min, node_max):
        return ray_intersects_aabb(self.ray, node_min, node_max)


class AabbQuery(NamedTuple):
    """Traversal collecting everything whose AABB overlaps a query box."""

    aabb: Aabb

    def intersects_node(self, node_min, node_max):
        separated = (self.aabb.max < node_min) | (node_max < self.aabb.min)
        return ~jnp.any(separated, axis=-1)


class PointQuery(NamedTuple):
    """Traversal collecting everything whose AABB contains a point."""

    point: jnp.ndarray  # [..., D]

    def intersects_node(self, node_min, node_max):
        return jnp.all((self.point >= node_min) & (self.point <= node_max), axis=-1)


class BallQuery(NamedTuple):
    """Traversal collecting everything whose AABB touches a ball."""

    ball: Ball

    def intersects_node(self, node_min, node_max):
        return self.ball.intersects_aabb(node_min, node_max)
