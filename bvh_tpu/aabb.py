"""Axis-aligned bounding boxes as structure-of-arrays JAX values.

TPU-first design: an ``Aabb`` is a pytree of two arrays ``(min, max)`` of shape
``[..., D]``. Every operation is batched and jittable — there is no scalar AABB
type; a single box is simply the batch shape ``()``. This replaces the
reference's per-object struct (reference: ``src/aabb/aabb_impl.rs:10-16``) with
vectorized columns that XLA can tile onto the VPU.

Semantics (empty/infinite bounds, join/grow algebra, the ``2*size.dot(size)``
surface-area proxy, iq-style ``min_distance_squared``) mirror the reference:
``src/aabb/aabb_impl.rs`` — ``empty:119-124``, ``infinite:150-155``,
``contains:175-177``, ``approx_contains_eps:198-203``,
``intersects_aabb:240-248``, ``join:303-308``, ``grow:375-380``,
``center:501-504``, ``is_empty:526-532``, ``surface_area:551-554``,
``volume:573-575``, ``largest_axis:594-596``, ``min_distance_squared:618-629``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Aabb(NamedTuple):
    """A batch of axis-aligned bounding boxes: arrays ``min``/``max`` of shape [..., D]."""

    min: jnp.ndarray
    max: jnp.ndarray

    # -- constructors ---------------------------------------------------------

    @staticmethod
    def with_bounds(min: jnp.ndarray, max: jnp.ndarray) -> "Aabb":
        min = jnp.asarray(min)
        max = jnp.asarray(max)
        return Aabb(min, max)

    @staticmethod
    def empty(d: int = 3, batch_shape: tuple = (), dtype=jnp.float32) -> "Aabb":
        """Empty box: min=+inf, max=-inf, so that grow/join are identity-safe."""
        inf = jnp.full(batch_shape + (d,), jnp.inf, dtype=dtype)
        return Aabb(inf, -inf)

    @staticmethod
    def infinite(d: int = 3, batch_shape: tuple = (), dtype=jnp.float32) -> "Aabb":
        inf = jnp.full(batch_shape + (d,), jnp.inf, dtype=dtype)
        return Aabb(-inf, inf)

    @staticmethod
    def from_points(points: jnp.ndarray) -> "Aabb":
        """Bounding box of ``points [..., K, D]`` along axis -2."""
        return Aabb(points.min(axis=-2), points.max(axis=-2))

    # -- predicates ------------------------------------------------------------

    def contains(self, p: jnp.ndarray) -> jnp.ndarray:
        """Componentwise ``min <= p <= max`` (all axes)."""
        return jnp.all((p >= self.min) & (p <= self.max), axis=-1)

    def approx_contains_eps(self, p: jnp.ndarray, epsilon) -> jnp.ndarray:
        return jnp.all((p - self.min > -epsilon) & (p - self.max < epsilon), axis=-1)

    def approx_contains_aabb_eps(self, other: "Aabb", epsilon) -> jnp.ndarray:
        return self.approx_contains_eps(other.min, epsilon) & self.approx_contains_eps(
            other.max, epsilon
        )

    def relative_eq(self, other: "Aabb", epsilon) -> jnp.ndarray:
        return jnp.all(jnp.abs(self.min - other.min) <= epsilon, axis=-1) & jnp.all(
            jnp.abs(self.max - other.max) <= epsilon, axis=-1
        )

    def intersects_aabb(self, other: "Aabb") -> jnp.ndarray:
        """Overlap test (touching counts): no separating axis."""
        separated = (self.max < other.min) | (other.max < self.min)
        return ~jnp.any(separated, axis=-1)

    def is_empty(self) -> jnp.ndarray:
        """True when min > max on any axis."""
        return jnp.any(self.min > self.max, axis=-1)

    # -- algebra ----------------------------------------------------------------

    def join(self, other: "Aabb") -> "Aabb":
        return Aabb(jnp.minimum(self.min, other.min), jnp.maximum(self.max, other.max))

    def grow(self, p: jnp.ndarray) -> "Aabb":
        return Aabb(jnp.minimum(self.min, p), jnp.maximum(self.max, p))

    def join_reduce(self, axis: int = 0) -> "Aabb":
        """Reduce a batch of boxes to their union along ``axis``."""
        return Aabb(self.min.min(axis=axis), self.max.max(axis=axis))

    # -- measures ---------------------------------------------------------------

    def size(self) -> jnp.ndarray:
        return self.max - self.min

    def center(self) -> jnp.ndarray:
        """Overflow-safe midpoint: min*0.5 + max*0.5."""
        return self.min * 0.5 + self.max * 0.5

    def half_size(self) -> jnp.ndarray:
        return (self.max - self.min) * 0.5

    def surface_area(self) -> jnp.ndarray:
        """The reference's D-generic SAH area proxy ``2 * size . size``
        (NOT the geometric 2(xy+yz+zx)); mirrored exactly so SAH splits agree."""
        s = self.size()
        return 2.0 * jnp.sum(s * s, axis=-1)

    def volume(self) -> jnp.ndarray:
        return jnp.prod(self.size(), axis=-1)

    def largest_axis(self) -> jnp.ndarray:
        """Index of the largest extent (first max wins, like nalgebra ``imax``)."""
        return jnp.argmax(self.size(), axis=-1)

    def min_distance_squared(self, point: jnp.ndarray) -> jnp.ndarray:
        """Squared distance from ``point`` to the closest point on/in the box.

        iq distance-function formulation: q = |p - center| - half_size;
        dist2 = |max(q, 0)|^2.
        """
        half = self.half_size()
        center = self.min + half
        q = jnp.abs(point - center) - half
        out = jnp.maximum(q, 0.0)
        return jnp.sum(out * out, axis=-1)


def joint_aabb(aabb_min: jnp.ndarray, aabb_max: jnp.ndarray, axis: int = 0):
    """Union of a batch of boxes given as raw arrays. Returns (min, max)."""
    return aabb_min.min(axis=axis), aabb_max.max(axis=axis)
