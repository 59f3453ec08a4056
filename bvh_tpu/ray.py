"""Rays and ray-primitive intersection, batched for the TPU VPU.

A ``Ray`` is a pytree of arrays ``(origin, direction, inv_direction)`` of shape
``[..., D]``. All tests are branch-free vector code over the batch: the analog
of the reference's per-ray SIMD specializations (reference:
``src/ray/intersect_simd.rs``) is simply the whole batch mapped onto the VPU.

Numerics mirror the reference exactly so results validate allclose/bit-equal:

* slab test: NaN in either corner product => miss (ray in an AABB face plane),
  hit iff ``tmax >= max(tmin, 0)``  (reference: ``src/ray/intersect_default.rs:17-37``)
* entry/exit slice: ``tmin = max(inf.max(), 0)``, miss when ``tmin > tmax`` or NaN
  (reference: ``src/ray/ray_impl.rs:118-145``)
* Moller-Trumbore with backface culling (``det < eps`` => miss) and distance
  ``+inf`` on miss (reference: ``src/ray/ray_impl.rs:154-213``)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Ray(NamedTuple):
    """A batch of rays; arrays of shape [..., D]. ``inv_direction`` is cached."""

    origin: jnp.ndarray
    direction: jnp.ndarray
    inv_direction: jnp.ndarray

    @staticmethod
    def create(origin: jnp.ndarray, direction: jnp.ndarray) -> "Ray":
        """Builds a ray batch; ``direction`` is normalized (reference Ray::new)."""
        origin = jnp.asarray(origin)
        direction = jnp.asarray(direction)
        if origin.shape != direction.shape:
            raise ValueError(
                f"origin {origin.shape} and direction {direction.shape} must match"
            )
        norm = jnp.sqrt(jnp.sum(direction * direction, axis=-1, keepdims=True))
        direction = direction / norm
        return Ray(origin, direction, 1.0 / direction)

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.origin + self.direction * t[..., None]


class Intersection(NamedTuple):
    """Result of a ray-triangle test; ``distance`` is +inf on miss."""

    distance: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def ray_intersects_aabb(
    ray: Ray, aabb_min: jnp.ndarray, aabb_max: jnp.ndarray
) -> jnp.ndarray:
    """Branchless slab test; True where the ray hits the box.

    NaN in any component of either corner product is a miss, matching the
    reference's policy for rays lying in a face plane
    (``src/ray/intersect_default.rs:22-28``).
    """
    lbr = (aabb_min - ray.origin) * ray.inv_direction
    rtr = (aabb_max - ray.origin) * ray.inv_direction
    has_nan = jnp.any(jnp.isnan(lbr) | jnp.isnan(rtr), axis=-1)
    inf = jnp.minimum(lbr, rtr)
    sup = jnp.maximum(lbr, rtr)
    tmin = inf.max(axis=-1)
    tmax = sup.min(axis=-1)
    return ~has_nan & (tmax >= jnp.maximum(tmin, 0.0))


def intersection_slice_for_aabb(ray: Ray, aabb_min: jnp.ndarray, aabb_max: jnp.ndarray):
    """Entry/exit distances of a ray against a box.

    Returns ``(hit, t_entry, t_exit)``; where ``hit`` is False the distances are
    meaningless. Mirrors ``src/ray/ray_impl.rs:118-145`` (tmin clamped to 0).
    """
    lbr = (aabb_min - ray.origin) * ray.inv_direction
    rtr = (aabb_max - ray.origin) * ray.inv_direction
    has_nan = jnp.any(jnp.isnan(lbr) | jnp.isnan(rtr), axis=-1)
    inf = jnp.minimum(lbr, rtr)
    sup = jnp.maximum(lbr, rtr)
    tmin = jnp.maximum(inf.max(axis=-1), 0.0)
    tmax = sup.min(axis=-1)
    hit = ~has_nan & (tmin <= tmax)
    return hit, tmin, tmax


def _cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def ray_intersects_triangle(
    ray: Ray, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> Intersection:
    """Batched Moller-Trumbore with backface culling (3D only).

    Branch structure (selects, not branches) mirrors the reference
    ``src/ray/ray_impl.rs:154-213``: ``det < eps`` => miss with (u,v)=(0,0);
    u out of [0,1] => miss with v=0; v<0 or u+v>1 => miss; dist<=eps => miss.
    Distance is +inf on every miss.
    """
    dtype = a.dtype
    eps = jnp.finfo(dtype).eps
    inf = jnp.asarray(jnp.inf, dtype)

    a_to_b = b - a
    a_to_c = c - a
    u_vec = _cross(ray.direction, a_to_c)
    det = jnp.sum(a_to_b * u_vec, axis=-1)

    cull = det < eps
    # Guard the reciprocal so masked-out lanes cannot produce inf*0 NaNs that
    # would poison u/v reporting; culled lanes never use inv_det's value.
    safe_det = jnp.where(cull, 1.0, det)
    inv_det = 1.0 / safe_det

    a_to_origin = ray.origin - a
    u = jnp.sum(a_to_origin * u_vec, axis=-1) * inv_det
    u_bad = (u < 0.0) | (u > 1.0)

    v_vec = _cross(a_to_origin, a_to_b)
    v = jnp.sum(ray.direction * v_vec, axis=-1) * inv_det
    v_bad = (v < 0.0) | (u + v > 1.0)

    dist = jnp.sum(a_to_c * v_vec, axis=-1) * inv_det
    dist_bad = dist <= eps

    miss = cull | u_bad | v_bad | dist_bad
    distance = jnp.where(miss, inf, dist)
    # Reference reports partially-computed (u, v) on early-outs: (0,0) on cull,
    # (u, 0) on a u-bound failure, (u, v) afterwards.
    u_out = jnp.where(cull, 0.0, u)
    v_out = jnp.where(cull | u_bad, 0.0, v)
    return Intersection(distance, u_out, v_out)
