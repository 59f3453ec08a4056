"""Ray tests mirroring reference src/ray/ray_impl.rs:216-423 (unit + property)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from bvh_tpu import (
    Ray,
    intersection_slice_for_aabb,
    ray_intersects_aabb,
    ray_intersects_triangle,
)

coord = st.floats(-100.0, 100.0, width=32)
vec3 = st.tuples(coord, coord, coord)


def mkray(o, d):
    return Ray.create(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def hit_aabb(ray, mn, mx):
    return bool(ray_intersects_aabb(ray, jnp.asarray(mn, jnp.float32), jnp.asarray(mx, jnp.float32)))


def test_ray_basic_hit():
    ray = mkray([0, 0, 0], [1, 0, 0])
    assert hit_aabb(ray, [99.9, -1, -1], [100.1, 1, 1])
    assert not hit_aabb(ray, [-100.1, -1, -1], [-99.9, 1, 1])  # behind the origin


def test_ray_inside_aabb_hits():
    ray = mkray([0, 0, 0], [0, 0, 1])
    assert hit_aabb(ray, [-1, -1, -1], [1, 1, 1])


def test_zero_depth_aabb():
    # reference src/ray/ray_impl.rs:245-254 — flat (zero-extent) box is hittable
    ray = mkray([0, 0, -1], [0, 0, 1])
    assert hit_aabb(ray, [-1, -1, 0], [1, 1, 0])


def test_ray_in_face_plane_nan_is_miss():
    # reference src/ray/ray_impl.rs:285-299 — the NaN special case: a ray
    # traveling in the plane of an AABB face does NOT intersect.
    ray = mkray([0, 1, 0], [1, 0, 0])  # travels in the y=1 plane
    assert not hit_aabb(ray, [1, 1, -1], [3, 3, 1])


def test_intersection_slice():
    ray = mkray([0, 0, 0], [1, 0, 0])
    hit, t0, t1 = intersection_slice_for_aabb(
        ray, jnp.array([2.0, -1, -1]), jnp.array([4.0, 1, 1])
    )
    assert bool(hit)
    assert float(t0) == pytest.approx(2.0)
    assert float(t1) == pytest.approx(4.0)
    # origin inside: entry clamps to 0
    hit, t0, t1 = intersection_slice_for_aabb(
        ray, jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1])
    )
    assert bool(hit) and float(t0) == 0.0 and float(t1) == pytest.approx(1.0)
    # miss
    hit, _, _ = intersection_slice_for_aabb(
        ray, jnp.array([-4.0, -1, -1]), jnp.array([-2.0, 1, 1])
    )
    assert not bool(hit)


def test_triangle_frontface_hit():
    ray = mkray([0, 0, -2], [0, 0, 1])
    # CCW when viewed from -z (normal faces the ray origin => front face)
    a = jnp.array([-1.0, -1.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    c = jnp.array([1.0, -1.0, 0.0])
    hit = ray_intersects_triangle(ray, a, b, c)
    assert float(hit.distance) == pytest.approx(2.0)
    # backface: swapped winding => culled
    miss = ray_intersects_triangle(ray, a, c, b)
    assert np.isinf(float(miss.distance))


def test_triangle_miss_outside():
    ray = mkray([10, 10, -2], [0, 0, 1])
    a = jnp.array([-1.0, -1.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    c = jnp.array([1.0, -1.0, 0.0])
    hit = ray_intersects_triangle(ray, a, b, c)
    assert np.isinf(float(hit.distance))


def test_triangle_behind_origin_misses():
    ray = mkray([0, 0, 2], [0, 0, 1])  # triangle at z=0 is behind
    a = jnp.array([-1.0, -1.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    c = jnp.array([1.0, -1.0, 0.0])
    hit = ray_intersects_triangle(ray, a, b, c)
    assert np.isinf(float(hit.distance))


@settings(max_examples=60, deadline=None)
@given(vec3, vec3, vec3)
def test_prop_ray_points_at_aabb_center(p1, p2, o):
    """A ray aimed at an AABB's center hits it (reference :301-334)."""
    lo = np.minimum(p1, p2).astype(np.float32) - 0.1
    hi = np.maximum(p1, p2).astype(np.float32) + 0.1
    center = (lo * 0.5 + hi * 0.5).astype(np.float32)
    origin = np.asarray(o, np.float32)
    direction = center - origin
    if np.linalg.norm(direction) < 1e-3:
        origin = origin + 50.0
        direction = center - origin
    ray = mkray(origin, direction)
    assert hit_aabb(ray, lo, hi)


@settings(max_examples=60, deadline=None)
@given(
    vec3,
    vec3,
    vec3,
    st.floats(0.0625, 0.875, width=32),
    st.floats(0.0625, 0.875, width=32),
)
def test_prop_moller_trumbore_on_triangle_points(a, b, c, s, t):
    """A ray through an interior triangle point reports a hit (front face)
    or a cull (back face), never a geometric miss. Mirrors reference :360-422."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = np.asarray(c, np.float32)
    # interior barycentric point
    u = s * 0.9
    v = t * (1.0 - u) * 0.9
    w = 1.0 - u - v
    if w <= 0.01 or u <= 0.01 or v <= 0.01:
        return
    n = np.cross(b - a, c - a)
    area2 = np.linalg.norm(n)
    if area2 < 1e-2:  # degenerate triangle
        return
    p = (w * a + u * b + v * c).astype(np.float32)
    origin = p + n / area2 * 5.0  # offset along the normal => front side
    ray = mkray(origin, p - origin)
    hit = ray_intersects_triangle(
        ray, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    )
    d = float(hit.distance)
    if np.isfinite(d):
        assert d == pytest.approx(5.0, rel=1e-3)
    # from the other side the winding is reversed => backface culled
    origin2 = p - n / area2 * 5.0
    ray2 = mkray(origin2, p - origin2)
    miss = ray_intersects_triangle(
        ray2, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    )
    assert not np.isfinite(float(miss.distance))


def test_batched_triangle_intersection():
    n = 64
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    origins = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    dirs = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ray = Ray.create(jnp.asarray(origins), jnp.asarray(dirs))
    out = ray_intersects_triangle(ray, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert out.distance.shape == (n,)
    # cross-check each lane against the scalar path
    for i in range(0, n, 7):
        ri = mkray(origins[i], dirs[i])
        hi = ray_intersects_triangle(
            ri, jnp.asarray(a[i]), jnp.asarray(b[i]), jnp.asarray(c[i])
        )
        assert np.allclose(float(hi.distance), float(out.distance[i]), equal_nan=True) or (
            np.isinf(float(hi.distance)) and np.isinf(float(out.distance[i]))
        )
